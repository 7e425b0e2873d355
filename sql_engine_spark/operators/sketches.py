"""Sketch-based data profiling — engine extension (SURVEY.md §2.3).

The profiling pass a training-data pipeline runs before anything else:
per-column approximate distinct counts, quantiles, and heavy hitters.
At 100 TB none of these can be exact-and-cheap at the same time, so the
operator uses the standard mergeable one-pass sketches Spark ships:

- **HyperLogLog** (``approx_count_distinct`` for estimates;
  ``hll_sketch_agg``/``hll_union_agg`` Apache DataSketches binaries for
  the *mergeable* form — build per shard/day, union later, never
  rescan).
- **Quantile sketch** (``percentile_approx``) with a configurable
  accuracy/memory knob.
- **Heavy hitters** via groupBy + top-1 (exact: counts are distributive
  so partial aggregation keeps reducer state proportional to distinct
  keys, which is what heavy-hitter columns have few of).

All sketches are one pass, map-side partial, constant driver output —
the profile of a 100 TB table costs one scan.

Accuracy bounds are asserted in tests/ against exact recomputation
(HLL default rsd 5%; quantiles within rank tolerance 1/accuracy).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANTILE_ACCURACY = 10000  # rank error <= n/accuracy


def profile_table(
    df: DataFrame, numeric_cols: list[str], categorical_cols: list[str]
) -> DataFrame:
    """One-pass sketch profile → one row per profiled column:
    (column, n_rows, approx_distinct, p50, p95, top_value, top_count).
    Quantiles are null for categoricals; top_value/top_count null for
    numerics (heavy hitters on high-cardinality numerics are rarely
    meaningful and would bloat reducer state)."""
    all_cols = list(numeric_cols) + list(categorical_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in all_cols:
        aggs.append(F.approx_count_distinct(c).alias(f"__ad_{c}"))
    for c in numeric_cols:
        aggs.append(
            F.percentile_approx(c, [0.5, 0.95], QUANTILE_ACCURACY).alias(f"__pq_{c}")
        )
    one = df.agg(*aggs)

    pieces = []
    for c in all_cols:
        cols = [
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__ad_{c}").alias("approx_distinct"),
        ]
        if c in numeric_cols:
            cols += [
                F.col(f"__pq_{c}")[0].cast("double").alias("p50"),
                F.col(f"__pq_{c}")[1].cast("double").alias("p95"),
            ]
        else:
            cols += [
                F.lit(None).cast("double").alias("p50"),
                F.lit(None).cast("double").alias("p95"),
            ]
        pieces.append(one.select(*cols))
    profile = reduce(DataFrame.unionByName, pieces)

    tops = [
        df.groupBy(F.col(c).cast("string").alias("top_value"))
        .agg(F.count(F.lit(1)).alias("top_count"))
        .orderBy(F.desc("top_count"), F.asc("top_value"))
        .limit(1)
        .select(F.lit(c).alias("column"), "top_value", "top_count")
        for c in categorical_cols
    ]
    if tops:
        top_df = reduce(DataFrame.unionByName, tops)
        profile = profile.join(top_df, on="column", how="left")
    else:
        profile = profile.withColumn("top_value", F.lit(None).cast("string")).withColumn(
            "top_count", F.lit(None).cast("long")
        )
    return profile


def mergeable_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group DataSketches HLL + global union — the shard-then-merge
    shape: each group's sketch is a small binary that unions in O(sketch)
    without rescanning data. Returns one row per group plus a
    ``__total__`` row whose estimate comes from the *union of the group
    sketches*, not a second scan."""
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col).alias("sketch")
    )
    groups = per_group.select(
        F.col(group_col).cast("string").alias("group"),
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )
    total = per_group.agg(F.hll_union_agg("sketch").alias("u")).select(
        F.lit("__total__").alias("group"),
        F.hll_sketch_estimate("u").alias("approx_distinct"),
    )
    return groups.unionByName(total)
