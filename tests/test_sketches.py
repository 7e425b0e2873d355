"""Accuracy bounds for the sketch-profiling operators: sketches are
approximate by construction (rows-only in the oracle matrix), so these
tests pin their error against exact recomputation on the same data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.catalog import load_table
from sql_engine_spark.operators.sketches import mergeable_distinct, profile_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_profile_distinct_within_hll_bound(spark, lineitem):
    prof = {r["column"]: r for r in profile_table(
        lineitem, ["l_quantity"], ["l_returnflag", "l_linestatus"]
    ).collect()}
    exact = lineitem.agg(
        *[F.countDistinct(c).alias(c) for c in ["l_quantity", "l_returnflag", "l_linestatus"]]
    ).first()
    for c in ["l_quantity", "l_returnflag", "l_linestatus"]:
        approx = prof[c]["approx_distinct"]
        # default rsd 5% → assert a loose 3-sigma 15% band
        assert abs(approx - exact[c]) <= max(3, 0.15 * exact[c]), (c, approx, exact[c])


def test_profile_quantiles_within_rank_tolerance(spark, lineitem):
    prof = {r["column"]: r for r in profile_table(lineitem, ["l_quantity"], []).collect()}
    n = lineitem.count()
    vals = [r[0] for r in lineitem.select("l_quantity").orderBy("l_quantity").collect()]
    for q, key in [(0.5, "p50"), (0.95, "p95")]:
        got = prof["l_quantity"][key]
        # rank tolerance: value must sit within n/QUANTILE_ACCURACY ranks
        from sql_engine_spark.operators.sketches import QUANTILE_ACCURACY

        tol = max(2, n // QUANTILE_ACCURACY + 1)
        lo = vals[max(0, int(q * n) - tol)]
        hi = vals[min(n - 1, int(q * n) + tol)]
        assert lo <= got <= hi, (key, got, lo, hi)


def test_profile_heavy_hitter_exact(spark, lineitem):
    prof = {r["column"]: r for r in profile_table(lineitem, [], ["l_returnflag"]).collect()}
    exact = (
        lineitem.groupBy("l_returnflag").count()
        .orderBy(F.desc("count"), F.asc("l_returnflag")).first()
    )
    assert prof["l_returnflag"]["top_value"] == exact["l_returnflag"]
    assert prof["l_returnflag"]["top_count"] == exact["count"]


def test_mergeable_distinct_union_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = {r["group"]: r["approx_distinct"] for r in
            mergeable_distinct(docs, "source", "doc_id").collect()}
    exact_total = docs.select("doc_id").distinct().count()
    # union-of-sketches estimate within 15% of the exact global distinct
    assert abs(rows["__total__"] - exact_total) <= max(3, 0.15 * exact_total)
    per_group_exact = {
        str(r["source"]): r["n"] for r in
        docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    for g, est in rows.items():
        if g != "__total__":
            assert abs(est - per_group_exact[g]) <= max(3, 0.15 * per_group_exact[g])


def test_portable_hll_within_bound_and_union_consistent(spark, sf_dir):
    """The portable-register HLL (r8 hard-oracle variant) meets the
    same accuracy contract as the DataSketches one, and its __total__
    row equals the estimate of the register-wise UNION by
    construction."""
    from sql_engine_spark.operators.sketches import portable_hll_distinct

    docs = load_table(spark, sf_dir, "documents")
    rows = {r["group"]: r["approx_distinct"] for r in
            portable_hll_distinct(docs, "source", "doc_id").collect()}
    exact_total = docs.select("doc_id").distinct().count()
    assert abs(rows["__total__"] - exact_total) <= max(3, 0.15 * exact_total)
    per_group_exact = {
        str(r["source"]): r["n"] for r in
        docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    for g, est in rows.items():
        if g != "__total__":
            assert abs(est - per_group_exact[g]) <= max(3, 0.15 * per_group_exact[g])
    # agreement with the DataSketches variant: both are ~1.6% rsd
    # estimators of the same truth, so they must land within a joint
    # 10% + slack band of each other on every group
    ds = {r["group"]: r["approx_distinct"] for r in
          mergeable_distinct(docs, "source", "doc_id").collect()}
    for g, est in rows.items():
        assert abs(est - ds[g]) <= max(3, 0.10 * max(est, ds[g])), (g, est, ds[g])


def test_portable_hll_linear_term_bitstable_over_entire_input_space(spark, sf_dir):
    """THE bit-stability proof the x30 hard oracle rests on (VERDICT r7
    #7 'attempt only if the fold proves bit-stable'): the r8 spike
    showed a runtime ``ln`` is NOT bit-stable — JVM Math.log and
    DuckDB's libm disagreed in the last bit on 302 of the 4096
    reachable linear-counting inputs — so the operator carries the
    m·ln(m/V) term as a precomputed 4096-entry table instead
    (sketches.HLL_LINEAR_LUT), formatted verbatim into both the Spark
    plan and the oracle SQL. The remaining risk surface is the literal
    round-trip itself (repr → each engine's decimal parser), so
    enumerate the ENTIRE input space on both engines and require
    repr-identical doubles — a finite-input-space proof, robust to any
    corpus regeneration. (The raw branch is a single int64→double cast
    + one division, correctly rounded identically by IEEE 754.)"""
    import duckdb

    from sql_engine_spark.operators.sketches import HLL_LINEAR_LUT, HLL_M

    lut = F.array(*[F.lit(x) for x in HLL_LINEAR_LUT])
    got = (
        spark.range(1, HLL_M + 1)
        .select(F.col("id").alias("v"), F.element_at(lut, F.col("id").cast("int")).alias("e"))
        .collect()
    )
    spark_vals = {r.v: repr(r.e) for r in got}
    from sql_engine_spark.matrix.ext import _dlit

    lut_sql = "[" + ", ".join(_dlit(x) for x in HLL_LINEAR_LUT) + "]"
    duck = duckdb.connect().execute(
        f"SELECT v, ({lut_sql})[CAST(v AS INTEGER)] AS e FROM range(1, {HLL_M + 1}) t(v)"
    ).fetchall()
    duck_vals = {v: repr(e) for v, e in duck}
    mismatches = [v for v in spark_vals if spark_vals[v] != duck_vals[v]]
    assert not mismatches, (len(mismatches), mismatches[:5])
    # and the table matches a direct recomputation (self-consistency)
    assert spark_vals[1] == repr(float(HLL_M) * math.log(float(HLL_M)))
