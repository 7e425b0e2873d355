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


# --- x63 image average-hash dedup ------------------------------------


def _py_ahash(text: str, width: int = 16, grid: int = 8):
    import numpy as np

    data = text.encode()
    stride = width * 3
    h = max(1, (len(data) + stride - 1) // stride)
    pixels = data.ljust(width * h * 3, b"\x00")
    # exact-rational threshold, mirroring image_avg_hash (r8):
    # cell_mean > global_mean ⟺ sum_c * N > S * cnt_c in int64
    g3 = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(h, width, 3)
        .astype(np.int64)
        .sum(axis=2)
    )
    ri = (np.arange(h) * grid) // h
    ci = (np.arange(width) * grid) // width
    cell = (ri[:, None] * grid + ci[None, :]).ravel()
    sums = np.bincount(cell, weights=g3.ravel(), minlength=grid * grid).astype(np.int64)
    cnts = np.bincount(cell, minlength=grid * grid)
    # Python ints like the operator's r8 guard — numpy int64 would wrap
    # past ~90 MP and silently diverge from the code this mirrors
    total, npix = int(g3.sum()), width * h
    bits = [int(sums[c]) * npix > total * int(cnts[c]) for c in range(grid * grid)]
    return tuple(
        sum((1 << off) for off in range(16) if bits[b * 16 + off]) for b in range(4)
    )


def test_image_avg_hash_matches_python(docs):
    from sql_engine_spark.operators.multimodal import encode_text_as_png, image_avg_hash

    rows = docs.select("doc_id", "text").collect()
    sig = {
        r.id: (r.band0, r.band1, r.band2, r.band3)
        for r in image_avg_hash(encode_text_as_png(docs)).collect()
    }
    assert len(sig) == len(rows)
    for r in rows:
        assert sig[r.doc_id] == _py_ahash(r.text), r.doc_id


def test_image_dup_pairs_exact_at_pigeonhole(docs):
    """hamming ≤ 3 < 4 bands ⟹ banding recall is EXACT (pigeonhole):
    the mined pair set must equal the brute-force all-pairs result."""
    from sql_engine_spark.operators.multimodal import encode_text_as_png, image_dup_pairs

    rows = docs.select("doc_id", "text").collect()
    sig = {r.doc_id: _py_ahash(r.text) for r in rows}
    ids = sorted(sig)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(sig[a], sig[b]))

    brute = {
        (a, b, ham(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_dup_pairs(encode_text_as_png(docs), max_hamming=3).collect()
    }
    assert got == brute
    assert len(got) > 0


def test_image_dup_identical_payloads_hamming_zero(spark):
    from sql_engine_spark.operators.multimodal import encode_text_as_png, image_dup_pairs

    df = spark.createDataFrame(
        [(0, "aa bb cc dd ee ff gg hh"), (1, "aa bb cc dd ee ff gg hh"), (2, "zz " * 40)],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.hamming for r in image_dup_pairs(encode_text_as_png(df)).collect()}
    assert got.get((0, 1)) == 0


# --- x64 source divergence / x65 quality-aware dedup -----------------


def test_source_divergence_matches_python(docs):
    from collections import Counter

    from sql_engine_spark.operators.pipeline import source_divergence

    rows = docs.select("source", "text").collect()
    corpus = Counter()
    for r in rows:
        corpus.update(r.text.split(" "))
    vocab = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    vset = {t for t, _ in vocab}
    per = {}
    for r in rows:
        c = per.setdefault(r.source, Counter())
        c.update(t for t in r.text.split(" ") if t in vset)
    N = sum(sum(c.values()) for c in per.values())
    got = {r.source: (r.n_tokens, r.chi2) for r in source_divergence(docs, 30).collect()}
    for src, cnt in per.items():
        n_s = sum(cnt.values())
        chi2 = 0.0
        for t, ct in sorted(vocab):  # token-sorted fold, same order
            o = cnt.get(t, 0)
            d = float(o * N - n_s * corpus[t])
            chi2 += (d * d) / ((float(N) * float(n_s)) * float(corpus[t]))
        assert got[src][0] == n_s
        assert got[src][1] == pytest.approx(chi2, rel=1e-12)


def test_source_divergence_detects_drift(spark):
    """A source with a shifted token distribution must score a larger
    χ² than sources drawn from the shared distribution."""
    rows = []
    for i in range(300):
        rows.append((i, "common " * 10 + f"w{i % 7}", f"s{i % 3}"))
    for i in range(300, 400):  # drifted source: disjoint vocabulary mass
        rows.append((i, "rare " * 10 + f"w{i % 7}", "drifted"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from sql_engine_spark.operators.pipeline import source_divergence

    got = {r.source: r.chi2 for r in source_divergence(df, 10).collect()}
    # base sources also carry some χ² (they lack the drifted source's
    # token mass), so assert a clear separation, not an absolute scale
    base = max(v for k, v in got.items() if k != "drifted")
    assert got["drifted"] > 2 * base


def test_quality_dedup_keeps_best_member(docs):
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.operators.pipeline import quality_dedup_survivors
    from sql_engine_spark.operators.text import quality_score

    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    comp = {r.doc_id: r.component for r in D.connected_components(pairs, docs).collect()}
    q = {r.doc_id: r.quality_score for r in quality_score(docs).collect()}
    best = {}
    size = {}
    for did, c in comp.items():
        size[c] = size.get(c, 0) + 1
        cur = best.get(c)
        cand = (-q[did], did)
        if cur is None or cand < cur:
            best[c] = cand
    got = {r.component: (r.keep_doc, r.keep_quality, r.n_docs) for r in
           quality_dedup_survivors(docs, pairs).collect()}
    assert set(got) == set(best)
    for c, (negq, did) in best.items():
        assert got[c][0] == did
        assert got[c][1] == pytest.approx(-negq, rel=1e-12)
        assert got[c][2] == size[c]
    # at least one multi-doc cluster where the keeper is NOT min id
    # would prove the policy differs from x03 — assert only if present
    multi = [c for c in got if got[c][2] >= 2]
    assert multi  # corpus has planted near-dups


def test_quality_dedup_null_text_component_keeps_min_id(spark):
    """A component whose EVERY member has NULL quality (NULL text is
    the only way to produce one) must still keep a representative —
    the min id, exactly what the removed q DESC NULLS LAST window
    kept — with keep_quality NULL. max_by skips NULL ordering keys,
    so without the -inf rank fallback keep_doc silently becomes
    NULL."""
    from sql_engine_spark.operators.pipeline import quality_dedup_survivors

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {r.component: r for r in quality_dedup_survivors(docs, pairs).collect()}
    assert got[1].keep_doc == 1
    assert got[1].keep_quality is None
    assert got[1].n_docs == 2
    # the healthy singleton keeps itself with a real score
    assert got[3].keep_doc == 3 and got[3].keep_quality is not None


def test_quality_dedup_single_aggregate_no_window(docs):
    # VERDICT r3 #3: the per-component keep-best must be map-side-
    # combinable HASH aggregation — no Window, and no SortAggregate
    # smuggling the sort back in (struct-buffered max_by falls back to
    # SortAggregate; the two-stage scalar shape must not). A mega
    # dup-component would be one unsplittable window partition.
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.operators.pipeline import quality_dedup_survivors

    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    plan = (
        quality_dedup_survivors(docs, pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "SortAggregate" not in plan, plan
    # both canonicalization aggregates present, partial+final each
    assert plan.count("HashAggregate(keys=[component") == 4, plan


# --- x66 funnel / x67 retention --------------------------------------


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_event_funnel_matches_python(events):
    from sql_engine_spark.operators.temporal import event_funnel

    rows = events.select("user_id", "ts", "event_id", "event_type").collect()
    per = defaultdict(list)
    for r in rows:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    steps = ("view", "click", "purchase")
    stages = Counter()
    for u, evs in per.items():
        st = 0
        for _, _, t in sorted(evs):
            if st < 3 and t == steps[st]:
                st += 1
        stages[st] += 1
    got = {r.stage: r.n_users for r in event_funnel(events).collect()}
    assert got == dict(stages)
    # the synthetic stream is busy enough that every user converts or
    # nearly every — at minimum the output covers all observed stages
    assert sum(got.values()) == len(per)


def test_event_funnel_order_matters(spark):
    """purchase-before-view users must NOT count as converted — the
    property that separates a funnel from three EXISTS filters."""
    from sql_engine_spark.operators.temporal import event_funnel

    rows = [
        # user 1: v -> c -> p (full conversion)
        (1, "2024-01-01 00:00:01", 1, "view"),
        (2, "2024-01-01 00:00:02", 1, "click"),
        (3, "2024-01-01 00:00:03", 1, "purchase"),
        # user 2: p -> c -> v (reverse order: stage 1 only, the view)
        (4, "2024-01-01 00:00:01", 2, "purchase"),
        (5, "2024-01-01 00:00:02", 2, "click"),
        (6, "2024-01-01 00:00:03", 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.stage: r.n_users for r in event_funnel(df).collect()}
    assert got == {3: 1, 1: 1}


def test_event_funnel_single_shuffle(events):
    from sql_engine_spark.operators.temporal import event_funnel

    plan = event_funnel(events)._jdf.queryExecution().executedPlan().toString()
    # per-user collect + final stage rollup — never k-way self-joins
    assert "Join" not in plan, plan


def test_retention_cohorts_matches_python(events):
    from sql_engine_spark.operators.temporal import retention_cohorts

    import datetime

    rows = events.select("user_id", "ts").collect()
    epoch = datetime.date(2024, 1, 1)
    uw = {(r.user_id, (r.ts.date() - epoch).days // 7) for r in rows}
    first = {}
    for u, w in uw:
        first[u] = min(first.get(u, w), w)
    grid = Counter((first[u], w - first[u]) for u, w in uw)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(events).collect()
    }
    assert got == dict(grid)


def test_event_anomalies_matches_python(events):
    import math

    from sql_engine_spark.operators.temporal import event_rate_anomalies

    rows = events.select("user_id").collect()
    per = Counter(r.user_id for r in rows)
    U = len(per)
    s1 = sum(per.values())
    s2 = sum(n * n for n in per.values())
    den = math.sqrt(float(U) * float(s2) - float(s1) * float(s1))
    got = {r.user_id: (r.n_events, r.z, r.is_anomaly) for r in event_rate_anomalies(events).collect()}
    assert set(got) == set(per)
    mu = s1 / U
    sigma = den / U
    for u, n in per.items():
        z = (float(n) * float(U) - float(s1)) / den if den > 0 else 0.0
        # the formula IS (n - mean)/stddev — pin the semantics, not
        # just self-consistency with the implementation
        assert z == pytest.approx((n - mu) / sigma, rel=1e-9)
        assert got[u][0] == n
        assert got[u][1] == pytest.approx(z, rel=1e-12)
        assert got[u][2] == (1 if abs(z) > 2.0 else 0)


def test_event_anomalies_flags_outlier(spark):
    from sql_engine_spark.operators.temporal import event_rate_anomalies

    rows = [(i, i % 20) for i in range(200)]  # 20 users x 10 events
    rows += [(1000 + i, 99) for i in range(200)]  # user 99: 200 events
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    got = {r.user_id: r.is_anomaly for r in event_rate_anomalies(df).collect()}
    assert got[99] == 1
    assert sum(got.values()) == 1  # only the bot


# --- x69 quarantine error-class taxonomy ------------------------------


def test_poison_payloads_quarantine_taxonomy(spark):
    """Each poison class (id mod 4) must land in its own quarantine
    error class under strict=False — and the healthy class must still
    decode to exact pixel stats; strict=True must raise instead."""
    from sql_engine_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(8)], "doc_id long, text string"
    )
    poisoned = M.poison_payloads(M.encode_text_as_png(docs))
    rows = {r.doc_id: r for r in M.image_stats(poisoned, strict=False).collect()}
    assert len(rows) == 8
    for i, r in rows.items():
        cls = i % 4
        if cls == 0:
            assert r.error is None and r.n_pixel_bytes == 48  # 1 row of 16 RGB px
            assert r.pixel_sum == sum(f"doc {i} body text".encode())
        else:
            want = {1: "ValueError", 2: "error", 3: "NotImplementedError"}[cls]
            assert r.error is not None and r.error.split(":")[0] == want, (i, r.error)
            assert r.width is None and r.pixel_sum is None
    # strict mode: the first poisoned payload fails the task loudly
    with pytest.raises(Exception):
        M.image_stats(poisoned, strict=True).collect()


def test_image_stats_on_jfif_fixture(spark):
    """VERDICT r4 #6 (updated r7 for the real baseline decoder):
    image_stats end-to-end on an actual encoded JFIF — dimensions come
    from the SOF0 scan (media_info) and the byte stats now cover REAL
    decoded pixels (huffman+IDCT), checked against a local
    jpeg_decode of the same payload. A header-only JFIF (SOF but no
    scan) is undecodable and must hit the quarantine boundary."""
    import struct

    import numpy as np

    from sql_engine_spark.operators.multimodal import image_stats, jpeg_decode
    from tests.test_jpeg_codec import _test_image, jpeg_encode_444

    img = _test_image(16, 24, seed=9)
    jfif = jpeg_encode_444(img)
    _w, _h, pix = jpeg_decode(jfif)
    df = spark.createDataFrame(
        [(1, bytearray(jfif), {"mime": "image/jpeg"})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    [r] = image_stats(df, strict=True).collect()
    assert (r.width, r.height) == (24, 16)  # SOF0 parse, w/h order correct
    assert r.n_pixel_bytes == len(pix) == 16 * 24
    assert r.pixel_sum == sum(pix)
    assert abs(r.pixel_sum - int(np.sum(img))) <= 2 * img.size  # decode fidelity
    # quarantine mode must treat the same healthy payload identically
    [q] = image_stats(df, strict=False).collect()
    assert q.error is None and (q.width, q.height) == (24, 16)

    # header-only JFIF (no DQT/DHT/SOS): decodable dims, no scan data —
    # strict raises, quarantine emits the (id, error) row
    hdr_only = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 48, 64) + b"\x03\x00\x00\x00"
        + b"\xff\xd9"
    )
    hdf = spark.createDataFrame(
        [(2, bytearray(hdr_only), {"mime": "image/jpeg"})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        image_stats(hdf, strict=True).collect()
    [qq] = image_stats(hdf, strict=False).collect()
    assert qq.error is not None and qq.width is None


def test_encode_decode_roundtrip_non_ascii(spark):
    """The PNG encode→decode pipeline is byte-level: non-ASCII text
    (CJK, emoji, combining marks) must round-trip with pixel_sum equal
    to the sum of the utf-8 BYTES — character-count arithmetic would
    silently diverge on multi-byte text (the corpus is ASCII, so only
    this test guards the unicode path)."""
    from sql_engine_spark.operators.multimodal import encode_text_as_png, image_stats

    texts = ["héllo wörld", "日本語のテキスト", "emoji 🚀🧪 mix", "á combining"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r.doc_id: r for r in image_stats(encode_text_as_png(df)).collect()}
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        assert rows[i].pixel_sum == sum(b), t
        assert rows[i].n_pixel_bytes == max(1, (len(b) + 47) // 48) * 48


def test_encode_null_text_as_empty_png(spark):
    """NULL text encodes as b'' — one zero-padded pixel row, pixel_sum
    0 — exactly what an oracle recomputing from strlen(COALESCE(text,
    '')) expects; str(None) == 'None' bytes would silently diverge and
    be Arrow/pandas-representation dependent (ADVICE r5)."""
    from sql_engine_spark.operators.multimodal import encode_text_as_png, image_stats

    df = spark.createDataFrame([(0, None), (1, "abc")], "doc_id long, text string")
    rows = {r.doc_id: r for r in image_stats(encode_text_as_png(df)).collect()}
    assert rows[0].n_pixel_bytes == 48
    assert rows[0].pixel_sum == 0
    assert rows[1].pixel_sum == sum(b"abc")
