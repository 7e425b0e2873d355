"""Exact money arithmetic over 2-decimal quantized doubles.

Floating-point summation is non-associative, so a distributed
``SUM(double)`` is run-order dependent — at 1000 executors the same
query can return different low bits on different runs, and can never
hash-match a single-threaded oracle. The corpus's monetary columns
(``l_extendedprice``, ``l_discount``, ``o_totalprice``, ``c_acctbal``,
``events.value``) are all 2-decimal quantized, so the engine aggregates
them as exact integer cents:

    sum(x)           → SUM(CAST(ROUND(x*100) AS LONG)) / 100.0
    sum(x*(1-d))     → SUM(e_cents * (100 - d_cents)) / 10000.0

Integer addition is associative → partial (map-side) aggregation is
exact and deterministic at any parallelism, and bit-identical to the
DuckDB oracle computing the same integer expression. This is also the
correct engineering for money at 100 TB (no drift), not just an oracle
trick. The reference has no such issue only because it is
single-threaded Python ints (reference sqlengine.py:274-294).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer representation of a quantized double column.

    Tie rule: Spark ``round`` is HALF_UP away from zero (-12.5 → -13).
    The stateful sessionizer's Python-side fold
    (streaming/stateful.py) instead uses ``floor(v*100 + 0.5)`` —
    half toward +inf, -12.5 → -12 — because ITS contract partner is
    the s02 DuckDB replay oracle, not this function. The two folds
    agree on every non-negative value and on all non-.5 ties, i.e.
    everywhere in the corpus; do NOT "unify" them without re-deriving
    both oracles (ADVICE r7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def from_cents(col: Column, scale: int = 100) -> Column:
    """Integer units → double, deterministic (single exact division)."""
    return (col.cast("double") / float(scale)).cast("double")


def cents_sum_as_double(col: Column | str, scale: int = 100) -> Column:
    """SUM over cents, returned as the double the user asked for."""
    return from_cents(F.sum(cents(col, scale)), scale)
