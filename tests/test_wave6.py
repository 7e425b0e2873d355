"""Wave-6 operator tests: epoch upsampling (x61), phrase mining (x62),
streaming ingest dedup (s08). Oracle parity runs in test_oracle_matrix;
here: Python recomputations, the expected-copies property, and the
batch-boundary-invariance proof for the streaming path.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from sql_engine_spark.catalog import load_table
from sql_engine_spark.operators.pipeline import (
    MIX_HASH_K,
    _MIX_BUCKETS,
    epoch_upsample,
    incremental_jaccard_pairs,
    incremental_pairs_vs_corpus,
)
from sql_engine_spark.operators.text import phrase_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --- x61 epoch upsampling --------------------------------------------


def test_epoch_upsample_matches_python(docs):
    eppm = {"src0": 2_300_000, "src1": 500_000}
    rows = docs.select("doc_id", "source").collect()
    exp = set()
    for r in rows:
        e = eppm.get(r.source, 1_000_000)
        h = (r.doc_id % _MIX_BUCKETS) * MIX_HASH_K % _MIX_BUCKETS
        n = e // 1_000_000 + (1 if h * 1_000_000 < (e % 1_000_000) * _MIX_BUCKETS else 0)
        for ci in range(1, n + 1):
            exp.add((r.doc_id, r.source, n, ci))
    got = {
        (r.doc_id, r.source, r.n_copies, r.copy_idx)
        for r in epoch_upsample(docs, eppm).collect()
    }
    assert got == exp


def test_epoch_upsample_realized_epochs(docs):
    """Realized copy count per source ≈ e·N (the coin is a ppm-exact
    integer threshold, so over N=50 docs per source at sf0.001 the
    realized count is e·N ± small)."""
    eppm = {"src0": 2_000_000, "src1": 500_000}  # exact 2.0 / coin 0.5
    out = epoch_upsample(docs, eppm)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert per["src0"] == 2 * n_src0  # integer epochs are EXACT
    n_src1 = docs.filter(F.col("source") == "src1").count()
    assert 0 < per.get("src1", 0) < n_src1  # fractional-only: strict subset


def test_epoch_upsample_no_shuffle(docs):
    plan = epoch_upsample(docs, {"src0": 2_300_000})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# --- x62 phrase mining -----------------------------------------------


def test_phrase_stats_matches_python(docs):
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    occ = Counter()
    dfreq = Counter()
    for did, t in texts.items():
        w = t.split(" ")
        grams = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
        occ.update(grams)
        dfreq.update(set(grams))
    order = sorted(dfreq, key=lambda p: (-dfreq[p], -occ[p], p))[:25]
    exp = [(p, dfreq[p], occ[p]) for p in order]
    got = [
        (r.phrase, r.n_docs, r.n_occurrences) for r in phrase_stats(docs, 3, 25).collect()
    ]
    assert got == exp


def test_phrase_stats_take_ordered(docs):
    plan = phrase_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


# --- s08 streaming ingest dedup --------------------------------------


def test_stream_ingest_dedup_batch_invariant(spark, docs, tmp_path):
    """Chop the 'new crawl' into several micro-batches
    (maxFilesPerTrigger=1 over a multi-file copy) — the unioned stream
    output must equal the one-shot batch computation AND x54's
    id-mod incremental dedup, proving batch-boundary invariance."""
    from sql_engine_spark.streaming.ingest import (
        read_documents_stream,
        stream_incremental_dedup,
    )

    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    src = str(tmp_path / "new_docs")
    new_docs.repartition(4).write.parquet(src)
    n_files = len([f for f in __import__("os").listdir(src) if f.endswith(".parquet")])
    assert n_files >= 2  # several micro-batches

    stream = read_documents_stream(spark, src, max_files_per_trigger=1, glob="*.parquet")
    got_df = stream_incremental_dedup(
        stream, corpus, out_path=str(tmp_path / "pairs"), checkpoint=str(tmp_path / "ckpt")
    )
    got = {(r.id_new, r.id_old, round(r.jaccard, 9)) for r in got_df.collect()}

    batch = {
        (r.id_new, r.id_old, round(r.jaccard, 9))
        for r in incremental_pairs_vs_corpus(new_docs, corpus).collect()
    }
    x54 = {
        (r.id_new, r.id_old, round(r.jaccard, 9))
        for r in incremental_jaccard_pairs(docs).collect()
    }
    assert got == batch == x54
    assert len(got) > 0  # the corpus actually has cross-mod near-dups

    # several __batch_id partitions really ran (stream was chopped)
    import os

    parts = [p for p in os.listdir(tmp_path / "pairs") if p.startswith("__batch_id=")]
    assert len(parts) >= 2


def test_stream_ingest_dedup_empty_stream(spark, docs, tmp_path):
    from sql_engine_spark.streaming.ingest import (
        read_documents_stream,
        stream_incremental_dedup,
    )

    src = str(tmp_path / "empty_docs")
    docs.filter(F.lit(False)).write.parquet(src)
    stream = read_documents_stream(spark, src, glob="*.parquet")
    out = stream_incremental_dedup(
        stream,
        docs,
        out_path=str(tmp_path / "pairs"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_new", "id_old", "jaccard"]
