"""Accuracy bounds for the sketch-profiling operators: sketches are
approximate by construction (rows-only in the oracle matrix), so these
tests pin their error against exact recomputation on the same data."""

from __future__ import annotations

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
