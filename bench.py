#!/usr/bin/env python3
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the three TPC-H-style plans (scan-agg, filtered 3-way
join top-k, 6-way broadcast join), the heaviest Tier-X pipelines
(near-dup dedup exact + LSH, similarity pair mining, sessionization),
and a streaming window run — the queries whose plans decide whether
the engine survives a 100× scale-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "e08_distinct",
    "g08_join_explicit_agg",
    "g19_window_topn",
    "x02_dedup_ngram_jaccard",
    "x04_dedup_minhash_lsh",
    "x06_sim_topk_brute",
    "x12_text_fingerprint",
    "x14_sessionize_batch",
    "x27_skyline",
    "x29_sketch_profile",
    "s01_stream_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sql_engine_spark import matrix
    from sql_engine_spark.session import get_spark

    spark = get_spark(app_name="sql_engine_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths so per-query numbers measure the plan,
    # not first-call classloading.
    matrix.QUERIES["e02_star"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = matrix.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
