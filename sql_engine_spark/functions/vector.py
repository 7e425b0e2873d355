"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
expressions (whole-stage codegen, no Python in the hot path).

All arithmetic is done in double after an explicit per-element cast and
accumulates left-to-right (``F.aggregate``), which makes the result
bit-identical to a sequential oracle computing the same expression —
important because cosine scores feed ORDER BY and threshold filters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right dot product of two double arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) = a·b / (|a| |b|). Inputs must already be double arrays
    (use :func:`to_double_array`); zero vectors yield NULL (guarded
    division) rather than an ANSI divide-by-zero error."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != F.lit(0.0), dot(a, b) / denom)
