"""Replica-scale harness (VERDICT r11 #3): the versioned, TESTED tool
behind the q18/q21/x-family scale curves, replacing the per-round
ad-hoc scripts whose id-offset arithmetic overflowed int32 twice (the
r11 ×500 IVF attempt and, same ANSI class, the engine itself back in
r4 — `sequence`-produced int × 10**7 offsets past 2**31 throw under
ANSI mode).

Protocol (exactly the one BASELINE.md's recorded curves used):

- **Replication**: every fact-table row is cloned ``factor`` times;
  clone ``k`` gets ``id + k * 10_000_000`` on each replica-key column
  (both operands CAST TO LONG FIRST — the tested fix). Dimension
  tables are NOT replicated, so fact→dim joins keep their original
  fanout while fact→fact joins (q18's semi, q21's semi/anti probes)
  grow with the data — the regime that separates shuffle-bound plans
  from candidate-quadratic ones.
- **First-bracket warmup discipline**: each (factor, query) point runs
  one discarded warmup before its timed runs, so the recorded bracket
  never carries codegen/classload cost (the r11 "1M pre-sample 0.85 s
  warmup signature" class).
- **min-of-N (default 3)**: replica curves read the plan's floor, not
  a contention sample — min, with the full run list kept for the
  record.
- **Canary context**: an e08 sample before and after the sweep, so a
  curve's window temperature is in its own record (BASELINE.md quotes
  these as "canary context").

Usage::

    python tools/replica_scale.py q21_waiting_supplier 1 5 25
    python tools/replica_scale.py q18_large_orders 1 5 25 --runs 3

Prints one JSON object: per-factor min + runs, step growth ratios, and
the canary context. Library surface (``replicate_table``,
``build_replica_dir``, ``run_curve``) is what the unit tests pin.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

# Spacing between replica id ranges. 10M clears every driver-corpus id
# at sf0.1; k * OFFSET must be computed in LONG (the tested invariant —
# at factor 500 the top offset is 4.99e9, past int32).
ID_OFFSET = 10_000_000

# Which columns carry the replica offset, per table. Only REPLICA-LOCAL
# keys (fact↔fact join keys, primary keys) are offset; dim foreign keys
# (o_custkey, l_suppkey, l_partkey) stay in-range so un-replicated
# dimensions join every replica — constant fanout per fact row.
FACT_ID_COLS: dict[str, list[str]] = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}

# Per-query protocol: which tables replicate. Everything else is
# symlinked from the base sf_dir unchanged.
PROTOCOLS: dict[str, tuple[str, ...]] = {
    "q18_large_orders": ("orders", "lineitem"),
    "q21_waiting_supplier": ("orders", "lineitem"),
    "q3_shipping_priority": ("orders", "lineitem"),
    "x02_dedup_ngram_jaccard": ("documents",),
    "x38_containment": ("documents",),
    "x54_incremental_dedup": ("documents",),
    "x18_sim_ivf": ("embeddings",),
    "x06_sim_topk_brute": ("embeddings",),
}


def replicate_table(df: DataFrame, factor: int, id_cols: list[str]) -> DataFrame:
    """Clone every row ``factor`` times, offsetting each ``id_cols``
    column by ``k * ID_OFFSET`` for clone k — with BOTH operands cast
    to long BEFORE the multiply, so the arithmetic is overflow-safe at
    any factor (pinned at ×500 in tests/test_units.py; plain
    ``sequence``-int × ID_OFFSET throws under ANSI past k≈214)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if factor == 1:
        return df
    # explode() cannot nest inside another expression (generator rule),
    # so __k lands as int32 and the cast happens AT THE USE SITE below —
    # the load-bearing line the test pins.
    rep = df.withColumn("__k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    for c in id_cols:
        rep = rep.withColumn(
            c,
            F.col(c).cast("long")
            + F.col("__k").cast("long") * F.lit(ID_OFFSET).cast("long"),
        )
    return rep.drop("__k")


def build_replica_dir(
    spark, sf_dir: str, factor: int, out_dir: str, fact_tables: tuple[str, ...]
) -> str:
    """Materialize a sf_dir-shaped directory: ``fact_tables`` written
    as ``factor``× id-offset replicas, every other table symlinked from
    the base corpus (zero copy — the catalog reads through links)."""
    from sql_engine_spark.catalog import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(out_dir, f"{name}.parquet")
        if name in fact_tables:
            replicate_table(
                load_table(spark, sf_dir, name), factor, FACT_ID_COLS[name]
            ).write.mode("overwrite").parquet(dst)
        elif not os.path.lexists(dst):
            os.symlink(src, dst)
    return out_dir


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_once(fn, spark, rep_dir: str) -> float:
    # Same memo hygiene as bench.py: timed runs measure the operator,
    # not a cache hit from their own warmup.
    from sql_engine_spark.operators.dedup import clear_shingle_index

    clear_shingle_index()
    t0 = time.perf_counter()
    _noop(fn(spark, rep_dir))
    return time.perf_counter() - t0


def run_curve(
    spark,
    query: str,
    factors: list[int],
    sf_dir: str,
    runs: int = 3,
    fact_tables: "tuple[str, ...] | None" = None,
) -> dict:
    """Build each replica dir, apply the warmup-then-min-of-N protocol,
    and return the curve with step growth ratios and canary context."""
    from sql_engine_spark import matrix

    fn = matrix.QUERIES[query]
    facts = fact_tables if fact_tables is not None else PROTOCOLS[query]
    canary = matrix.QUERIES["e08_distinct"]

    def canary_sample() -> float:
        return round(min(_time_once(canary, spark, sf_dir) for _ in range(2)), 3)

    # Pay the fresh-session warmup before ANY sample (driver_sim's
    # absorber rationale): one untimed canary run.
    _time_once(canary, spark, sf_dir)
    base = tempfile.mkdtemp(prefix="replica_scale_")
    curve: dict = {"query": query, "sf_dir": sf_dir, "runs": runs, "points": {}}
    curve["canary_pre"] = canary_sample()
    try:
        for factor in factors:
            rep_dir = build_replica_dir(
                spark, sf_dir, factor, os.path.join(base, f"x{factor}"), facts
            )
            warmup = round(_time_once(fn, spark, rep_dir), 3)
            samples = [round(_time_once(fn, spark, rep_dir), 3) for _ in range(runs)]
            curve["points"][f"x{factor}"] = {
                "min": min(samples),
                "runs": samples,
                "warmup": warmup,
            }
            print(
                f"# x{factor}: min {min(samples):.3f}s over {runs} runs "
                f"{samples} (warmup {warmup:.3f}s)",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    curve["canary_post"] = canary_sample()
    mins = [(f, curve["points"][f"x{f}"]["min"]) for f in factors]
    curve["growth"] = {
        f"x{b}_over_x{a}": round(tb / max(ta, 1e-9), 2)
        for (a, ta), (b, tb) in zip(mins, mins[1:])
    }
    if len(mins) > 1:
        curve["growth"][f"x{mins[-1][0]}_over_x{mins[0][0]}"] = round(
            mins[-1][1] / max(mins[0][1], 1e-9), 2
        )
    return curve


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query")
    ap.add_argument("factors", nargs="+", type=int)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--facts",
        default=None,
        help="comma-separated fact tables (default: the query's PROTOCOLS entry)",
    )
    args = ap.parse_args()

    from sql_engine_spark.session import get_spark

    spark = get_spark(app_name="replica-scale")
    spark.sparkContext.setLogLevel("ERROR")
    facts = tuple(args.facts.split(",")) if args.facts else None
    curve = run_curve(spark, args.query, args.factors, args.sf_dir, args.runs, facts)
    print(json.dumps(curve))


if __name__ == "__main__":
    main()
