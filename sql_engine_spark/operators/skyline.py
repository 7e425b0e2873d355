"""Skyline (Pareto-dominance) operator — engine extension.

The reference has no skyline construct (SURVEY.md §2.2 "Not present
anywhere"); design follows the Spark-SQL skyline work surveyed in
PAPERS.md (skyline-in-Spark-SQL, EDBT 2023), re-expressed so the whole
plan is JVM expressions — no Python workers anywhere:

1. **Grouped pre-aggregation** (`groupBy(x).min(y)`): for a 2-D skyline
   (both minimized) only the minimum-y row of each x-value can be on
   the frontier. The hash aggregate's map-side partials ARE the
   partition-local prune — each input partition emits at most its own
   distinct-x count, with zero data movement beyond the one shuffle.
2. **Prefix-min sweep** over the aggregated (x, ymin) relation: in x
   order, a point is on the frontier iff its ymin is strictly below
   the running minimum of all strictly-smaller x. One window over the
   pre-aggregated relation (|distinct x| rows, typically orders of
   magnitude below |rows|; if even that outgrows one task, the classic
   two-level bucketed scan applies — bucket by x-range, sweep per
   bucket, stitch with per-bucket minima).
3. **Broadcast recovery join**: the frontier is skyline-sized
   (~polylog n), so an equi-join on (x, y=ymin) back to the input
   recovers every original row — exact duplicates all survive, and the
   join broadcasts with no shuffle.

Dominance (both dimensions minimized): ``b`` dominates ``a`` iff
``b.x <= a.x AND b.y <= a.y`` with strict ``<`` in at least one
dimension. Exact ties (same x **and** y) dominate in neither
direction, so duplicate points all survive — matching the standard
definition and the NOT EXISTS SQL oracle.

NULL dimensions: under SQL three-valued logic a row with a NULL x or y
can never be dominated (every comparison against the NULL is unknown,
so no witness qualifies) and can never dominate. Such rows bypass the
sweep and pass straight through — the same rows the NOT EXISTS oracle
keeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Skyline of ``df`` minimizing (``x_col``, ``y_col``)."""
    x, y = F.col(x_col), F.col(y_col)
    nullish = x.isNull() | y.isNull()
    body = df.filter(~nullish)

    # Only the min-y row of each x can survive; map-side partials make
    # this the shuffle-free local prune.
    g = body.groupBy(x_col).agg(F.min(y_col).alias("__ymin"))

    # Global prefix-min sweep: frontier x is strictly increasing with
    # strictly decreasing ymin. The empty-frame window (no partition)
    # runs as one task over the PRE-AGGREGATED relation only.
    w = Window.orderBy(x_col).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        g.withColumn("__prev", F.min("__ymin").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__ymin") < F.col("__prev")))
        .select(F.col(x_col).alias("__fx"), F.col("__ymin").alias("__fy"))
    )

    kept = body.join(
        F.broadcast(frontier),
        (x == F.col("__fx")) & (y == F.col("__fy")),
        "left_semi",
    )
    # NULL-dimension rows are never dominated (3VL) — pass through.
    return kept.unionByName(df.filter(nullish))
