#!/usr/bin/env python3
"""Round-4 profiling scratch: stage-level timing for x59 / x38 at sf0.1.
Run: python tools/profile_r4.py [x59|x38]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_engine_spark.catalog import load_table  # noqa: E402
from sql_engine_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s", file=sys.stderr)
    return out


def profile_x59(spark, sf_dir):
    from sql_engine_spark.operators import similarity as S
    from sql_engine_spark.operators.dedup import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    for run in range(4):
        print(f"-- x59 run {run}", file=sys.stderr)
        t0 = time.perf_counter()
        C = t("train", lambda: S._train_spherical_quantizer(emb, "vec_id", "embedding", 8, S.ANN_SEED))
        assigned = S._with_list_assignment(emb, C, "embedding").select(
            F.col("vec_id").alias("id"), F.col("list_id"), F.col("__unit").alias("unit")
        )
        pairs = t("pairs(gemm)", lambda: S._within_cluster_pairs(assigned, 0.4).localCheckpoint())
        comp = t("cc", lambda: connected_components(pairs, emb, id_col="vec_id"))
        t("noop-write", lambda: comp.select(
            "vec_id", "component", (F.col("vec_id") == F.col("component")).cast("long").alias("kept")
        ).write.format("noop").mode("overwrite").save())
        print(f"  TOTAL {time.perf_counter()-t0:.3f}s", file=sys.stderr)


def profile_x38(spark, sf_dir):
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.operators import pipeline as P

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for run in range(4):
        print(f"-- x38 run {run}", file=sys.stderr)
        D.clear_shingle_index()
        t0 = time.perf_counter()
        sh = D.shingle_index(docs)
        t("shingle_index build", lambda: sh.foreach(lambda r: None) or sh.count())
        osh = D.ordered_shingle_index(sh)
        t("ordered index build", lambda: osh.count())
        cands = P._containment_candidates(sh, 0.6)
        t("candidates", lambda: cands.write.format("noop").mode("overwrite").save())
        full = P.containment_pairs(docs, threshold=0.6)
        t("full (incl verify, reuses memos)", lambda: full.write.format("noop").mode("overwrite").save())
        print(f"  TOTAL {time.perf_counter()-t0:.3f}s", file=sys.stderr)
    # end-to-end timing matching the bench protocol
    for run in range(3):
        D.clear_shingle_index()
        t(f"bench-shape run {run}", lambda: P.containment_pairs(docs, threshold=0.6)
          .write.format("noop").mode("overwrite").save())


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-r4")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "x59"
    if which == "x59":
        profile_x59(spark, sf_dir)
    else:
        profile_x38(spark, sf_dir)


if __name__ == "__main__":
    main()
