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

import math

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


# --- portable-register HLL (r8, VERDICT r7 #7) -----------------------
# A from-scratch HyperLogLog whose register state is derived from the
# repo's PORTABLE 60-bit md5-prefix hash (the x04/x05 family,
# operators/dedup.py) instead of DataSketches binaries — so the whole
# sketch, union included, replays in DuckDB and x30 becomes a HARD
# oracle row. The estimator contains exactly ONE runtime float op: the
# constant/int64 division of the raw branch, which IEEE 754 rounds
# identically on every engine. The small-range linear-counting term
# m·ln(m/V) is NOT computed with a runtime ln — the r8 spike proved
# libm ln is platform-divergent (302 of the 4096 reachable inputs
# differ in the last bit between the JVM and DuckDB; pinned in
# tests/test_sketches.py) — but its input space is finite, so it is a
# 4096-entry precomputed table (HLL_LINEAR_LUT) formatted verbatim
# into both the Spark plan and the oracle SQL: bit-identical by
# construction AND platform-independent at 1000 executors, which a
# libm call never is. Flajolet et al. 2007 estimator shape; original
# implementation.

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_HLL_W = 60 - HLL_P  # rank window: the hash's remaining 48 bits
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# Scaled-integer harmonic domain: sum_j 2^-M_j * 2^(W+1) is an exact
# int64 (M_j <= W+1 = 49, so 4096 * 2^49 < 2^62) — no float
# accumulation order anywhere in the fold.
_HLL_SCALE = 1 << (_HLL_W + 1)
HLL_EST_CONST = HLL_ALPHA * HLL_M * HLL_M * float(_HLL_SCALE)
# m·ln(m/V) for V = 1..m. repr() round-trips doubles exactly and both
# engines parse decimal literals to nearest-double, so the value each
# engine computes is THIS value, not its libm's.
HLL_LINEAR_LUT = [float(HLL_M) * math.log(HLL_M / v) for v in range(1, HLL_M + 1)]


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """(group, idx, m) register rows → (group, approx_distinct).
    Harmonic fold in exact int64, then the standard raw/linear-counting
    estimator with bit-stable float ops (module comment)."""
    agg = regs.groupBy("group").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m)")).alias("sp"),
        F.count(F.lit(1)).alias("nr"),
    )
    s = (F.col("sp") + (F.lit(HLL_M) - F.col("nr")) * F.lit(_HLL_SCALE)).cast("double")
    v = (F.lit(HLL_M) - F.col("nr")).cast("long")
    raw = F.lit(HLL_EST_CONST) / s
    # Table lookup, not F.log — module comment; greatest() keeps the
    # index valid under ANSI mode when the raw branch is the live one.
    lut = F.array(*[F.lit(x) for x in HLL_LINEAR_LUT])
    lin = F.element_at(lut, F.greatest(v, F.lit(1)).cast("int"))
    return agg.select(
        "group",
        F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lin).otherwise(raw).alias("approx_distinct"),
    )


def portable_hll_registers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HLL register state (group, idx, m) from the portable
    60-bit hash: low HLL_P bits pick the register, the leading-zero
    rank of the remaining 48 bits is max-folded per register. ONE
    shuffle keyed (group, idx) with map-side MAX combine — per-group
    reducer state is register-bounded (≤ m rows), never
    cardinality-bounded; this is the whole scale story."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .select(
            "group",
            F.col("h").bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
            F.shiftright("h", HLL_P).alias("w"),
        )
        .select(
            "group",
            "idx",
            F.when(F.col("w") == 0, F.lit(_HLL_W + 1))
            .otherwise(F.lit(_HLL_W + 1) - F.length(F.bin("w")))
            .alias("rank"),
        )
        .groupBy("group", "idx")
        .agg(F.max("rank").alias("m"))
    )


def portable_hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Mergeable per-group distinct estimate + ``__total__`` union row,
    same contract as :func:`mergeable_distinct` but with portable
    (SQL-replayable) register state: the union is a register-wise MAX
    over the per-group states — O(m) per merge, no rescans — which is
    the same shard-then-merge shape as the DataSketches variant
    (agreement between the two is pinned in tests/test_sketches.py)."""
    regs = portable_hll_registers(df, group_col, value_col)
    total = (
        regs.groupBy("idx")
        .agg(F.max("m").alias("m"))
        .select(F.lit("__total__").alias("group"), "idx", "m")
    )
    return _hll_estimate(regs.unionByName(total))
