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
- **Heavy hitters** via a single MELTED pass: every categorical column
  explodes to (column, value) rows inside the scan stage, one
  groupBy(column, value) counts them all (partial aggregation keeps
  shuffle volume at the SUM of per-column distincts), and a min over
  (-count, value) structs picks winners — no window, no join.

The profile of a 100 TB table costs exactly TWO scans, independent of
column count: one for every sketch aggregate, one (melted) for every
categorical heavy hitter — asserted in tests/test_plans.py.

Accuracy bounds are asserted in tests/ against exact recomputation
(HLL default rsd 5%; quantiles within rank tolerance 1/accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANTILE_ACCURACY = 2000  # rank error <= n/accuracy (0.05%)


def profile_table(
    df: DataFrame, numeric_cols: list[str], categorical_cols: list[str]
) -> DataFrame:
    """One-pass sketch profile → one row per profiled column:
    (column, n_rows, approx_distinct, p50, p95, top_value, top_count).
    Quantiles are null for categoricals; top_value/top_count null for
    numerics (heavy hitters on high-cardinality numerics are rarely
    meaningful and would bloat reducer state)."""
    if not numeric_cols and not categorical_cols:
        raise ValueError("profile_table: no columns to profile")
    profile = None
    if numeric_cols:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in numeric_cols:
            aggs.append(F.approx_count_distinct(c).alias(f"__ad_{c}"))
            aggs.append(
                F.percentile_approx(c, [0.5, 0.95], QUANTILE_ACCURACY).alias(f"__pq_{c}")
            )
        one = df.agg(*aggs)

        # Pivot the single aggregate row to one row per numeric column
        # with ONE explode — per-column union branches would re-execute
        # the whole aggregate (and re-scan the table) once per column
        # unless ReuseExchange happened to dedupe them.
        entries = []
        for c in numeric_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__ad_{c}").alias("approx_distinct"),
                    F.col(f"__pq_{c}")[0].cast("double").alias("p50"),
                    F.col(f"__pq_{c}")[1].cast("double").alias("p95"),
                )
            )
        profile = (
            one.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.*")
            .withColumn("top_value", F.lit(None).cast("string"))
            .withColumn("top_count", F.lit(None).cast("long"))
        )

    if categorical_cols:
        # Categorical columns never touch the sketch scan: MELT each
        # row to k (column, value) pairs scan-side, then ONE
        # groupBy(column, value). Partial aggregation collapses each
        # input partition to its per-column distincts before the
        # shuffle, so shuffle volume is bounded by the SUM of
        # per-column cardinalities — not the PRODUCT a joint
        # (c1, …, ck) tuple-group would carry, which regresses badly
        # when several independent mid-cardinality columns multiply
        # out (ADVICE r3). The k× melted rows exist only inside the
        # scan stage and never shuffle. From this (column, value,
        # count) relation, per-column distinct counts are EXACT
        # (marginal row count — better than the HLL estimate the
        # sketch scan would give), n_rows is the count sum, and the
        # heavy hitter is a min over (-count, value) structs — no
        # window sort, no join.
        counts = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("string").alias("top_value"),
                            )
                            for c in categorical_cols
                        ]
                    )
                ).alias("kv")
            )
            .groupBy("kv.column", "kv.top_value")
            .agg(F.count(F.lit(1)).alias("top_count"))
        )
        # NULL handling matches COUNT(DISTINCT col)/mode semantics: the
        # NULL group counts toward n_rows but is excluded from the
        # distinct count and can never be the heavy hitter (min over a
        # WHEN-guarded struct ignores the null-valued group).
        best = F.min(
            F.when(
                F.col("top_value").isNotNull(),
                F.struct(
                    (-F.col("top_count")).alias("nc"), F.col("top_value").alias("v")
                ),
            )
        )
        cat_profile = (
            counts.groupBy("column")
            .agg(
                F.sum("top_count").alias("n_rows"),
                F.count("top_value").cast("long").alias("approx_distinct"),  # exact
                best.alias("__best"),
            )
            .select(
                "column",
                "n_rows",
                "approx_distinct",
                F.col("__best")["v"].alias("top_value"),
                (-F.col("__best")["nc"]).alias("top_count"),
            )
        )
        cat_rows = cat_profile.select(
            "column",
            "n_rows",
            "approx_distinct",
            F.lit(None).cast("double").alias("p50"),
            F.lit(None).cast("double").alias("p95"),
            "top_value",
            "top_count",
        )
        profile = cat_rows if profile is None else profile.unionByName(cat_rows)
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
