"""Wave-5 operator tests: chunk dedup + reconstruction (x56),
component-aware splits (x57), weighted priority sampling (x58),
SemDeDup (x59), distributed k-means refinement (x60). Oracle parity
for x56–x58 runs in test_oracle_matrix; here are behavioral contracts,
full Python recomputations, plan shapes, and the exactness /
equivalence proofs backing the two rows-only entries.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from sql_engine_spark.catalog import load_table
from sql_engine_spark.operators import dedup as D
from sql_engine_spark.operators import similarity as S
from sql_engine_spark.operators.pipeline import (
    PRIORITY_HASH_K,
    _MIX_BUCKETS,
    chunk_dedup,
    component_splits,
    weighted_priority_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def unit_vecs(emb):
    data = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    out = {}
    for i, v in data.items():
        n = np.linalg.norm(v)
        out[i] = v / n if n > 0 else v
    return out


# --- x56 chunk dedup -------------------------------------------------


def _py_chunk_dedup(texts: dict[int, str], c: int = 16):
    """Reference keep-first chunk dedup in plain Python."""
    occ = []  # (doc_id, idx, chunk) in corpus order
    for did in sorted(texts):
        w = texts[did].split(" ")
        n = max(-(-len(w) // c), 1)
        for i in range(n):
            occ.append((did, i, " ".join(w[i * c : i * c + c])))
    seen = set()
    kept = {did: [] for did in texts}
    counts = {did: [0, 0] for did in texts}  # [n_chunks, n_kept]
    for did, i, ch in occ:  # sorted (doc_id, idx) == corpus order
        counts[did][0] += 1
        if ch not in seen:
            seen.add(ch)
            counts[did][1] += 1
            kept[did].append(ch)
    return {
        did: (counts[did][0], counts[did][1], " ".join(kept[did])) for did in texts
    }


def test_chunk_dedup_matches_python(docs):
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    exp = _py_chunk_dedup(texts)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
        for r in chunk_dedup(docs, 16).collect()
    }
    assert got == exp
    # the corpus must actually exercise removal (planted dups share text)
    assert any(v[0] != v[1] for v in got.values())


def test_chunk_dedup_keep_first_synthetic(spark):
    # doc 1 repeats doc 0's first chunk; doc 0 keeps it, doc 1 loses it.
    a = " ".join(f"t{i}" for i in range(16))
    b = " ".join(f"u{i}" for i in range(8))  # partial tail chunk
    df = spark.createDataFrame(
        [(0, a + " " + b), (1, a), (2, b)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_dedup(df, 16).collect()}
    assert (out[0].n_chunks, out[0].n_kept) == (2, 2)
    assert out[0].clean_text == a + " " + b
    assert (out[1].n_chunks, out[1].n_kept) == (1, 0)
    assert out[1].clean_text == ""
    # doc 2's single chunk is exactly doc 0's tail chunk text → removed
    assert (out[2].n_chunks, out[2].n_kept) == (1, 0)
    assert out[2].clean_text == ""


def test_chunk_dedup_two_exchanges(docs):
    plan = chunk_dedup(docs, 16)._jdf.queryExecution().executedPlan().toString()
    # exactly the per-chunk keep-first aggregate + the per-doc rebuild
    # — no hidden extra shuffle (token-level explode would not add an
    # Exchange but the chunking must stay scan-stage; 2 is the floor
    # for exact corpus-wide dedup with reconstruction)
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_chunk_dedup_no_window_on_chunk(docs):
    # VERDICT r3 #2: the chunk key must never hit a Window — a skewed
    # window partition (one boilerplate chunk × 10⁸) is one straggler
    # task AQE cannot split; keep-first must be a map-side-combinable
    # aggregate instead.
    plan = chunk_dedup(docs, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_chunk_dedup_skewed_fixture_no_straggler(spark):
    # One chunk text duplicated 10⁵× vs 10⁵ distinct chunks: the
    # map-side combine must collapse the hot chunk before the shuffle,
    # so the skewed corpus runs within 2× of the uniform one (a
    # window-based keep-first sorts all 10⁵ copies in one task).
    import time

    hot = " ".join(f"h{i}" for i in range(16))
    skewed = spark.range(100_000).selectExpr("id AS doc_id", f"'{hot}' AS text")
    uniform = spark.range(100_000).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', 'u0', id, 'u2', 'u3', 'u4', 'u5', 'u6', 'u7', "
        "'u8', 'u9', 'u10', 'u11', 'u12', 'u13', 'u14', id) AS text",
    )
    # correctness on the skewed fixture: doc 0 keeps the chunk,
    # everyone else loses theirs
    out = chunk_dedup(skewed, 16)
    agg = out.selectExpr(
        "sum(n_kept) AS kept", "sum(n_chunks) AS total",
        "min(case when n_kept = 1 then doc_id end) AS keeper"
    ).collect()[0]
    assert (agg.kept, agg.total, agg.keeper) == (1, 100_000, 0)
    t0 = time.monotonic()
    chunk_dedup(uniform, 16).agg({"n_kept": "sum"}).collect()
    t_uniform = time.monotonic() - t0
    t0 = time.monotonic()
    chunk_dedup(skewed, 16).agg({"n_kept": "sum"}).collect()
    t_skewed = time.monotonic() - t0
    # generous floor keeps the ratio meaningful on a noisy box
    assert t_skewed <= 2.0 * max(t_uniform, 0.5), (t_skewed, t_uniform)


# --- x58 weighted priority sampling ----------------------------------


def test_weighted_sample_matches_python(docs):
    rows = docs.select("doc_id", "source", "n_chars").collect()
    per = {}
    for r in rows:
        w = max(int(r.n_chars), 1)
        key = ((r.doc_id % _MIX_BUCKETS) * PRIORITY_HASH_K % _MIX_BUCKETS) // w
        per.setdefault(r.source, []).append((key, r.doc_id, w))
    exp = set()
    for src, lst in per.items():
        for rnk, (key, did, w) in enumerate(sorted(lst)[:20], start=1):
            exp.add((did, src, w, key, rnk))
    got = {
        (r.doc_id, r.source, r.weight, r.sample_key, r.rnk)
        for r in weighted_priority_sample(docs, k=20).collect()
    }
    assert got == exp


def test_weighted_sample_prefers_heavier_rows(spark):
    """With ids fixed, scaling one row's weight up can only move it
    EARLIER in the priority order (key = h // w is non-increasing in
    w) — the monotonicity that makes the knob mean something."""
    df1 = spark.createDataFrame(
        [(i, "s", 10) for i in range(200)], "doc_id long, source string, n_chars long"
    )
    light = {r.doc_id for r in weighted_priority_sample(df1, k=20).collect()}
    # give one non-sampled doc a huge weight → it must enter the sample
    missing = min(set(range(200)) - light)
    df2 = df1.withColumn(
        "n_chars", F.when(F.col("doc_id") == missing, F.lit(10_000_000)).otherwise(10)
    )
    heavy = {r.doc_id for r in weighted_priority_sample(df2, k=20).collect()}
    assert missing in heavy


def test_weighted_sample_single_shuffle(docs):
    plan = weighted_priority_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- x57 component splits --------------------------------------------


def test_component_splits_no_leakage(docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    out = {r.doc_id: (r.component, r.split) for r in component_splits(docs, pairs).collect()}
    for p in pairs.collect():
        assert out[p.id_a][1] == out[p.id_b][1], (p.id_a, p.id_b)
        assert out[p.id_a][0] == out[p.id_b][0]
    # split labels present and sane proportions (98/1/1 ppm defaults)
    n = len(out)
    n_train = sum(1 for v in out.values() if v[1] == "train")
    assert n_train >= 0.9 * n


def test_component_splits_singletons_use_own_id(docs, spark):
    empty = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    from sql_engine_spark.operators.pipeline import assign_splits

    got = {r.doc_id: r.split for r in component_splits(docs, empty).collect()}
    exp = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    assert got == exp


# --- x59 semantic dedup ----------------------------------------------


def test_semantic_dedup_single_list_is_exact(emb, unit_vecs):
    """n_lists=1 removes the cluster restriction → must equal the
    brute-force threshold graph's connected components exactly."""
    ids = sorted(unit_vecs)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        if float(unit_vecs[a] @ unit_vecs[b]) >= 0.4:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exp = {i: find(i) for i in ids}
    got = {r.vec_id: (r.component, r.kept) for r in S.semantic_dedup(emb, 0.4, n_lists=1).collect()}
    assert {i: c for i, (c, _) in got.items()} == exp
    assert all(k == (1 if exp[i] == i else 0) for i, (_, k) in got.items())


def test_semantic_dedup_planted_recall(spark):
    """On a corpus with REAL near-dup structure (planted copies at
    cos≈0.999) the cluster restriction must not lose dups: every
    planted copy lands in its original's component."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 16))
    rows = [(i, base[i].tolist()) for i in range(120)]
    # plant 30 near-copies: id 1000+i ≈ vector of id i
    for i in range(30):
        rows.append((1000 + i, (base[i] + 0.01 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in S.semantic_dedup(df, threshold=0.95, n_lists=4).collect()}
    found = sum(1 for i in range(30) if out[1000 + i].component == out[i].component)
    assert found / 30 >= 0.9, f"planted recall {found}/30"
    # survivors: every component representative kept, copies dropped
    assert all(out[i].kept == 1 or out[i].component != i for i in range(120))


def test_semantic_dedup_pairs_join_on_list(emb):
    plan = S.semantic_dedup(emb, 0.4, n_lists=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_arrow_assignment_equals_expression_twin(emb):
    """`_assign_lists_arrow` (numpy mapInPandas, the semantic-dedup
    path) must agree with `_with_list_assignment` (scan expression,
    the IVF path) BIT-EXACTLY: since r9 the Arrow stage computes its
    norms and centroid dots with the order-pinned vectorized folds
    (`_fold_norms_np`/`_fold_dots_np`), which reproduce the JVM
    expression fold's rounding sequence lane-for-lane — the old
    near-tie margin skip (ADVICE r4, BLAS-gemm order) is gone, and
    this exactness is what makes the x59 pair set oracle-replayable."""
    C = S._train_spherical_quantizer(emb, "vec_id", "embedding", 8, S.ANN_SEED)
    arrow = {
        r.id: (r.list_id, np.asarray(r.unit))
        for r in S._assign_lists_arrow(emb, C, "vec_id", "embedding").collect()
    }
    expr = {
        r["vec_id"]: (r["list_id"], np.asarray(r["__unit"]))
        for r in S._with_list_assignment(emb, C, "embedding")
        .select("vec_id", "list_id", "__unit")
        .collect()
    }
    assert set(arrow) == set(expr)
    for i in arrow:
        assert arrow[i][0] == expr[i][0], f"list_id mismatch at {i}"
        assert np.array_equal(arrow[i][1], expr[i][1]), f"unit bits differ at {i}"


def test_arrow_payload_modes_equal_expression_twin(emb):
    """Direct pin for the r10 payload modes of `_assign_lists_arrow`
    against the JVM twin (the x18/x60 hash-green sims are the implicit
    evidence; this is the unit-level one): ``payload="maxdot"`` must be
    bit-equal to ``array_max(__dots)`` (kmeans_refine's tightness
    source — both argmaxes take the FIRST max), ``payload="vec"`` must
    pass the raw float32 vector through Arrow byte-identically
    (ivf_topk's exact-rerank input), and ``keep_lists`` must drop
    exactly the rows whose list_id falls outside the probe set (the
    x18 Arrow-traffic cut) while never changing surviving rows."""
    C = S._train_spherical_quantizer(emb, "vec_id", "embedding", 8, S.ANN_SEED)
    expr = {
        r["vec_id"]: (r["list_id"], r["__maxdot"], r["embedding"])
        for r in S._with_list_assignment(emb, C, "embedding")
        .select(
            "vec_id", "list_id", F.array_max("__dots").alias("__maxdot"), "embedding"
        )
        .collect()
    }
    md = {
        r.id: (r.list_id, r.maxdot)
        for r in S._assign_lists_arrow(
            emb, C, "vec_id", "embedding", payload="maxdot"
        ).collect()
    }
    assert set(md) == set(expr)
    for i, (lid, dot) in md.items():
        assert lid == expr[i][0], f"list_id mismatch at {i}"
        assert dot == expr[i][1], f"maxdot bits differ at {i}"
    vec = {
        r.id: (r.list_id, r.embedding)
        for r in S._assign_lists_arrow(
            emb, C, "vec_id", "embedding", payload="vec"
        ).collect()
    }
    # Row-set equality BEFORE the per-row loop (ADVICE r10): without
    # it, a regression that silently dropped rows in vec mode would
    # pass vacuously — the maxdot block above already pins its set.
    assert set(vec) == set(expr)
    for i, (lid, v) in vec.items():
        assert lid == expr[i][0]
        assert v == expr[i][2], f"raw vec changed through Arrow at {i}"
    keep = [0, 3, 5]
    pruned = {
        r.id: (r.list_id, r.embedding)
        for r in S._assign_lists_arrow(
            emb, C, "vec_id", "embedding", payload="vec", keep_lists=keep
        ).collect()
    }
    assert pruned == {
        i: (lid, v) for i, (lid, _, v) in expr.items() if lid in set(keep)
    }
    with pytest.raises(ValueError, match="payload"):
        S._assign_lists_arrow(emb, C, "vec_id", "embedding", payload="nope")


# --- x60 k-means refinement ------------------------------------------


def test_kmeans_refine_matches_numpy(emb):
    """Exact (bit-equality, since r9) mirror of the fixed-point Lloyd's
    refinement via the SHARED sequential replay the x60 oracle builder
    also calls (similarity._kmeans_replay_np — one implementation, two
    consumers, no copy to drift), at iterations=3 ≠ the entry's
    X60_ITERS so the parameter plumbing is exercised independently.
    Bit-equality here is the evidence the hard oracle rests on."""
    data = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    ids = sorted(data)
    M = np.vstack([data[i] for i in ids])
    nrm = S._fold_norms_np(M)
    U = M / np.where(nrm > 0, nrm, 1.0)[:, None]
    C0 = S._train_spherical_quantizer(emb, "vec_id", "embedding", 8, S.ANN_SEED)
    C = S._kmeans_replay_np(U, C0, 3)
    dots = S._fold_dots_np(U, C)
    assign = np.argmax(dots, axis=1)
    got = {r.list_id: (r.n_vectors, r.mean_cos) for r in S.kmeans_refine(emb, 8, iterations=3).collect()}
    for j in range(len(C)):
        m = assign == j
        if not m.any():
            assert j not in got
            continue
        n = int(m.sum())
        qc = int(np.floor(dots[m, j] * 1000000.0 + 0.5).astype(np.int64).sum())
        mc = (float(qc) / 1000000.0) / n
        assert got[j][0] == n
        assert got[j][1] == mc, f"mean_cos bits differ for cluster {j}"


def test_kmeans_refine_improves_tightness(emb):
    """Refinement rounds must not worsen mean within-cluster cosine
    (Lloyd's monotonicity, up to the unit-sphere renormalization)."""
    r0 = S.kmeans_refine(emb, 8, iterations=0).collect()
    r4 = S.kmeans_refine(emb, 8, iterations=4).collect()

    def overall(rows):
        tot = sum(r.n_vectors for r in rows)
        return sum(r.mean_cos * r.n_vectors for r in rows) / tot

    assert overall(r4) >= overall(r0) - 1e-9


# --- quantizer training-sample guards (VERDICT r10 #2) ---------------


def _list_sizes(emb_df, C):
    rows = (
        S._assign_lists_arrow(emb_df, C, "vec_id", "embedding")
        .groupBy("list_id")
        .count()
        .collect()
    )
    return [r["count"] for r in rows]


@pytest.mark.parametrize("sample_order", ["id", "hash"])
def test_quantizer_lists_balanced(spark, emb, sample_order):
    """List-size skew guard: a quantizer trained on either
    deterministic sample (first-N ids, or the hash-ordered shuffle-
    quality sample) must yield BALANCED inverted lists on both the
    isotropic corpus and the planted-near-dup corpus — max list ≤ 2×
    mean (measured ~1.15× on both). This is the tripwire for the
    100 TB failure mode SCALE.md adjudicates (unrepresentative
    training sample → degenerate centroids → skewed lists → probe
    recall collapse): if a future corpus or training change breaks
    balance, this fails before the recall numbers quietly rot."""
    n = emb.count()
    C = S._train_spherical_quantizer(
        emb, "vec_id", "embedding", 8, S.ANN_SEED, sample_order=sample_order
    )
    sizes = _list_sizes(emb, C)
    assert len(sizes) == 8, "degenerate quantizer: empty inverted lists"
    assert max(sizes) <= 2.0 * (n / 8), sizes

    # Planted corpus (bench's _planted_recall regime): 10 near-dups of
    # one base vector unioned in — the near-dup-mining workload must
    # not tip a list over the bound either.
    qv = S.get_vector(emb, 0)
    q = np.asarray(qv, dtype=np.float64)
    q = q / np.linalg.norm(q)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(10):
        g = rng.standard_normal(len(q))
        u = g - (g @ q) * q
        u = u / np.linalg.norm(u)
        v = 0.97 * q + np.sqrt(1.0 - 0.97**2) * u
        rows.append((-(i + 1), [float(x) for x in v]))
    planted = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    Cp = S._train_spherical_quantizer(
        planted, "vec_id", "embedding", 8, S.ANN_SEED, sample_order=sample_order
    )
    psizes = _list_sizes(planted, Cp)
    assert max(psizes) <= 2.0 * ((n + 10) / 8), psizes


def test_quantizer_hash_sample_is_duckdb_replayable(spark, emb, sf_dir):
    """The ``sample_order="hash"`` option must be (a) a genuinely
    different, id-range-spanning sample — the point is breaking the
    low-ids-correlate-with-one-source failure mode — and (b) bit-
    replayable in DuckDB (``ORDER BY md5(CAST(id AS VARCHAR))``), so
    an oracle builder could retrain from the SAME rows exactly as the
    x18/x59/x60 builders do for the id-order default today. Both
    engines emit lowercase hex md5 over the same decimal string, so
    the lexicographic order agrees row-for-row."""
    import duckdb

    n_sample = 32
    spark_ids = [
        r.id
        for r in emb.select(F.col("vec_id").alias("id"))
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(n_sample)
        .collect()
    ]
    duck_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT vec_id FROM read_parquet('{sf_dir}/embeddings.parquet') "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id "
            f"LIMIT {n_sample}"
        ).fetchall()
    ]
    assert spark_ids == duck_ids
    # Not the first-N-ids sample, and spans well past the first N.
    assert spark_ids != sorted(spark_ids)[:n_sample] or max(spark_ids) >= n_sample
    assert max(spark_ids) > 4 * n_sample

    with pytest.raises(ValueError, match="sample_order"):
        S._train_spherical_quantizer(
            emb, "vec_id", "embedding", 8, S.ANN_SEED, sample_order="random"
        )
