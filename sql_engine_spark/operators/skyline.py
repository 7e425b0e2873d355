"""Skyline (Pareto-dominance) operator — engine extension.

The reference has no skyline construct (SURVEY.md §2.2 "Not present
anywhere"); design follows the Spark-SQL skyline work surveyed in
PAPERS.md (skyline-in-Spark-SQL, EDBT 2023): the classic two-phase
distributed skyline —

1. **Local pruning** (`mapInPandas`, Arrow-batched, no shuffle): each
   partition computes its own 2-D skyline with a vectorized
   sort + prefix-min sweep. Because ``skyline(S) = skyline(∪ᵢ
   skyline(Pᵢ))`` for any partitioning P of S, dropping locally
   dominated rows is lossless. At 100 TB this is the step that
   matters: the surviving candidate set grows ~polylogarithmically
   with n, so a 10⁹-row partition set reduces to thousands of
   candidates without any data movement.
2. **Global refine** (broadcast nested-loop anti-join): the small
   candidate set is self-joined on the strict-dominance predicate;
   rows with a dominating witness are anti-joined away. Catalyst
   broadcasts the candidate set, so no shuffle here either.

Dominance (both dimensions minimized): ``b`` dominates ``a`` iff
``b.x <= a.x AND b.y <= a.y`` with strict ``<`` in at least one
dimension. Exact ties (same x **and** y) dominate in neither
direction, so duplicate points all survive — matching the standard
definition and the NOT EXISTS SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline_2d(pdf: pd.DataFrame, x_col: str, y_col: str) -> pd.DataFrame:
    """Vectorized 2-D skyline of one in-memory batch (both minimized).

    Sort by (x, y); a row survives iff its y is strictly below the
    running y-minimum of all strictly-smaller-x rows AND it attains the
    y-minimum of its own x-group (equal-x rows with larger y are
    dominated; exact duplicates all attain the minimum and survive).
    """
    if len(pdf) == 0:
        return pdf
    x = pdf[x_col].to_numpy()
    y = pdf[y_col].to_numpy()
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    prefix_min = np.minimum.accumulate(ys)
    starts = np.concatenate(([True], xs[1:] != xs[:-1]))
    group_id = np.cumsum(starts) - 1
    start_idx = np.flatnonzero(starts)
    # min y among rows with strictly smaller x = prefix min just before
    # this x-group starts (+inf for the first group).
    best_prev = np.concatenate(([np.inf], prefix_min[start_idx[1:] - 1]))[group_id]
    group_min = ys[start_idx][group_id]  # ys sorted within group → first is min
    keep_sorted = (ys < best_prev) & (ys == group_min)
    keep = np.zeros(len(pdf), dtype=bool)
    keep[order[keep_sorted]] = True
    return pdf[keep]


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Skyline of ``df`` minimizing (``x_col``, ``y_col``)."""
    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_skyline_2d(pdf, x_col, y_col)

    # Both sides of the refine join read `candidates`; without a persist
    # the pruning scan (the dominant cost at scale) would execute twice
    # — once to build the broadcast, once as the probe side. The
    # candidate set is skyline-sized (~polylog n), so caching it is
    # cheap insurance, spilling to disk if a pathological frontier is
    # large.
    from pyspark import StorageLevel

    candidates = df.mapInPandas(prune, schema=schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = candidates.alias("a")
    b = F.broadcast(candidates.alias("b"))
    ax, ay = F.col(f"a.{x_col}"), F.col(f"a.{y_col}")
    bx, by = F.col(f"b.{x_col}"), F.col(f"b.{y_col}")
    dominated_by = (bx <= ax) & (by <= ay) & ((bx < ax) | (by < ay))
    return a.join(b, on=dominated_by, how="left_anti")
