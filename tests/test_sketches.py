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


def test_profile_quantiles_within_hdr_relative_error(spark, lineitem):
    """The HDR sketch reports the bin endpoint NEAREST ZERO of the bin
    holding the ceil-rank value (the lower bound for positives, the
    mirrored upper bound for negatives), so |reported| <= |exact| and
    exact lies within one bin width (max(1 cent, |reported| >>
    SUB_BITS)) of it, on the reported value's far-from-zero side.
    Exact cents use the SAME floor(v*100+0.5) tie rule as the operator
    and oracle (round() would banker's-round .5 ties the other way)."""
    import math

    from sql_engine_spark.operators.sketches import QUANTILE_SUB_BITS

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    prof = {r["column"]: r for r in profile_table(lineitem, cols, []).collect()}
    for c in cols:
        vals = sorted(
            int(math.floor(r[0] * 100 + 0.5))
            for r in lineitem.select(c).collect()
            if r[0] is not None
        )
        nn = len(vals)
        for num, den, key in [(1, 2, "p50"), (95, 100, "p95")]:
            rank = -(-num * nn // den)  # ceil(q*nn)
            exact_cents = vals[rank - 1]
            got_cents = int(math.floor(prof[c][key] * 100 + 0.5))
            width = max(1, abs(got_cents) >> QUANTILE_SUB_BITS)
            if got_cents >= 0:
                ok = got_cents <= exact_cents <= got_cents + width
            else:
                ok = got_cents - width <= exact_cents <= got_cents
            assert ok, (c, key, got_cents, exact_cents, width)


def test_hdr_bin_roundtrip_and_cross_engine_parity(spark):
    """hdr_bin/hdr_lower_bound: lb(bin(v)) <= v < lb(bin(v)) + width,
    bin monotone in v — and the Spark and DuckDB spellings of both
    expressions agree value-for-value (incl. 0, unit bins, octave
    boundaries, and mirrored negatives)."""
    import duckdb

    from sql_engine_spark.operators.sketches import (
        QUANTILE_SUB_BITS,
        hdr_bin_sql,
        hdr_lower_bound_sql,
    )

    probe = sorted(
        {0, 1, 2, 127, 128, 129, 255, 256, 1 << 20, (1 << 20) + 12345, 5273875}
        | {(1 << k) + d for k in range(7, 63) for d in (-1, 0, 1)}
    )  # every octave boundary up to 2^62 — the full BIGINT cents domain
    probe = probe + [-v for v in probe if v]
    sdf = spark.createDataFrame([(v,) for v in probe], "v long").selectExpr(
        "v", f"{hdr_bin_sql('v')} AS b"
    ).selectExpr("v", "b", f"{hdr_lower_bound_sql('b')} AS lb")
    srows = {r["v"]: (r["b"], r["lb"]) for r in sdf.collect()}
    con = duckdb.connect()
    drows = {
        v: (b, lb)
        for v, b, lb in con.execute(
            "SELECT v, "
            + hdr_bin_sql("v", duck=True)
            + " AS b, "
            + hdr_lower_bound_sql(hdr_bin_sql("v", duck=True), duck=True)
            + " AS lb FROM (SELECT unnest(?::BIGINT[]) AS v)",
            [probe],
        ).fetchall()
    }
    con.close()
    assert srows == drows
    prev_bin = None
    for v in sorted(probe):
        b, lb = srows[v]
        width = max(1, abs(lb) >> QUANTILE_SUB_BITS)
        assert lb <= v if v >= 0 else lb >= v, (v, b, lb)
        assert abs(v - lb) < width + 1, (v, b, lb, width)
        if prev_bin is not None:
            assert b >= prev_bin, (v, b, prev_bin)
        prev_bin = b


def test_hdr_bin_randomized_three_way_parity(spark):
    """Randomized reinforcement of the boundary probe: Spark, DuckDB,
    and an INDEPENDENT Python reference of the HDR bin math must agree
    on arbitrary BIGINT cents in ±2⁶² (the derivation below uses
    int.bit_length / plain shifts — none of the SQL spellings), and
    every reported lower bound must satisfy the one-bin error contract.
    Seeded sample, one batched comparison per engine — not per-value
    round trips."""
    import random

    import duckdb

    from sql_engine_spark.operators.sketches import (
        QUANTILE_SUB_BITS,
        _QSB,
        hdr_bin_sql,
        hdr_lower_bound_sql,
    )

    def py_bin(v: int) -> int:
        a = abs(v)
        if a < _QSB:
            pos = a
        else:
            o = a.bit_length()
            pos = o * _QSB + (a >> (o - 1 - QUANTILE_SUB_BITS)) - _QSB
        return pos if v >= 0 else -pos

    def py_lb(b: int) -> int:
        a = abs(b)
        if a < (1 + QUANTILE_SUB_BITS) * _QSB:
            pos = a
        else:
            pos = (_QSB + a % _QSB) << (a // _QSB - 1 - QUANTILE_SUB_BITS)
        return pos if b >= 0 else -pos

    rng = random.Random(20260815)
    probe = [rng.randint(-(1 << 62), 1 << 62) for _ in range(4000)] + [
        rng.randint(-(1 << k), 1 << k) for k in range(1, 63) for _ in range(8)
    ]
    want = {v: (py_bin(v), py_lb(py_bin(v))) for v in probe}
    srows = {
        r["v"]: (r["b"], r["lb"])
        for r in spark.createDataFrame([(v,) for v in probe], "v long")
        .selectExpr("v", f"{hdr_bin_sql('v')} AS b")
        .selectExpr("v", "b", f"{hdr_lower_bound_sql('b')} AS lb")
        .collect()
    }
    con = duckdb.connect()
    drows = {
        v: (b, lb)
        for v, b, lb in con.execute(
            "SELECT v, "
            + hdr_bin_sql("v", duck=True)
            + " AS b, "
            + hdr_lower_bound_sql(hdr_bin_sql("v", duck=True), duck=True)
            + " AS lb FROM (SELECT unnest(?::BIGINT[]) AS v)",
            [probe],
        ).fetchall()
    }
    con.close()
    assert srows == want and drows == want
    for v, (b, lb) in want.items():
        width = max(1, abs(lb) >> QUANTILE_SUB_BITS)
        assert abs(lb) <= abs(v) < abs(lb) + width, (v, b, lb)


def test_profile_all_null_numeric_column(spark):
    """An entirely-NULL numeric column must keep its profile row:
    n_rows counts every row, distinct is 0 (all-zero registers →
    lut[4096] = m·ln(m/m) = 0 exactly), quantiles NULL — the shape
    the x29 oracle's LEFT JOIN + COALESCE(e, 0.0) mirrors (a plain
    INNER JOIN to the register CTE would DROP the column)."""
    df = spark.createDataFrame(
        [(float(i), None) for i in range(7)], "a double, b double"
    )
    prof = {r["column"]: r for r in profile_table(df, ["a", "b"], []).collect()}
    assert set(prof) == {"a", "b"}
    r = prof["b"]
    assert (r["n_rows"], r["approx_distinct"]) == (7, 0)
    assert r["p50"] is None and r["p95"] is None
    assert prof["a"]["approx_distinct"] == 7


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
    round-trip itself (repr → each engine's decimal parser — on the
    Spark side Jackson's parseDouble, since the operator ships the lut
    as one from_json string literal, sketches.hll_lut_sql), so
    enumerate the ENTIRE input space on both engines THROUGH THE
    OPERATOR'S OWN SPELLING and require repr-identical doubles — a
    finite-input-space proof, robust to any corpus regeneration. (The
    raw branch is a single int64→double cast + one division, correctly
    rounded identically by IEEE 754.)"""
    import duckdb

    from sql_engine_spark.operators.sketches import HLL_LINEAR_LUT, HLL_M, hll_lut_sql

    got = (
        spark.range(1, HLL_M + 1)
        .selectExpr("id AS v", f"element_at({hll_lut_sql()}, CAST(id AS INT)) AS e")
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
