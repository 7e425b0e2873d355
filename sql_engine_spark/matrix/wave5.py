"""Round-3 wave 5: corpus-rewriting dedup and cluster-level curation —
chunk-level dedup with document reconstruction (x56), leakage-free
component-aware splits (x57), integer-exact weighted sampling (x58),
SemDeDup semantic dedup (x59), and distributed k-means refinement
(x60). x56–x58 carry exact DuckDB oracles; x59/x60 joined them in r9
via builder-retrained literal centroids (data-dependent oracles,
matrix.ORACLE_BUILDERS), order-pinned vectorized folds, micro-unit
fixed-point sums, and a recursive-CTE CC replay — equivalence and
recall remain pytest-tested besides.

Same exactness rules as the other waves: integer counters end-to-end,
BIGINT casts on both engines, unique-id tiebreaks, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.catalog import load_table
from sql_engine_spark.matrix import query
from sql_engine_spark.matrix.ext import _JACCARD_PAIRS_CTE
from sql_engine_spark.operators import pipeline as P


@query(
    "x56_chunk_dedup",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(COALESCE(text,''), ' ') AS w FROM documents),
    ch0 AS (
      SELECT doc_id,
             [array_to_string(w[(i*16+1):(i*16+16)], ' ')
              for i in range(0, GREATEST(CAST(ceil(len(w)/16.0) AS BIGINT), 1))] AS chunks
      FROM tok
    ),
    ch1 AS (
      SELECT doc_id, unnest(chunks) AS chunk,
             generate_subscripts(chunks, 1) - 1 AS chunk_idx
      FROM ch0
    ),
    r AS (
      SELECT doc_id, chunk_idx, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
      FROM ch1
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), '') AS clean_text
    FROM r GROUP BY doc_id
    """,
)
def x56_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup WITH document reconstruction
    (operators/pipeline.chunk_dedup — the CCNet/RefinedWeb paragraph
    dedup shape): 16-token chunks, keep-first in (doc_id, chunk_idx)
    order, documents reassembled from surviving chunks. Unlike x51
    (which reports shared spans) this emits the cleaned corpus itself;
    scan-stage chunking, two wide shuffles (keep-first as a map-side-
    combinable min(struct) aggregate on the chunk text, per-doc
    rebuild)."""
    docs = load_table(spark, sf_dir, "documents")
    return P.chunk_dedup(docs, chunk_tokens=16)


@query(
    "x57_component_splits",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE},
    dup AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.8),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id)
    SELECT doc_id, component,
           CASE WHEN (((component % 1048576) * {P.SPLIT_HASH_K}) % 1048576) * CAST(1000000 AS BIGINT)
                     < CAST(10000 AS BIGINT) * 1048576 THEN 'test'
                WHEN (((component % 1048576) * {P.SPLIT_HASH_K}) % 1048576) * CAST(1000000 AS BIGINT)
                     < CAST(20000 AS BIGINT) * 1048576 THEN 'val'
                ELSE 'train' END AS split
    FROM comp
    """,
)
def x57_component_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split (operators/pipeline
    .component_splits): the split coin is hashed on each doc's
    near-duplicate connected-component label, so no Jaccard-≥-0.8 pair
    can straddle train and test — the dedup-before-split discipline a
    per-doc coin (x45) cannot enforce. Oracle = recursive-CTE
    reachability (x20's) + x45's integer split arithmetic on the
    component label."""
    from sql_engine_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    return P.component_splits(docs, pairs)


@query(
    "x58_weighted_sample",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, GREATEST(CAST(n_chars AS BIGINT), 1) AS weight,
             (((doc_id % 1048576) * {P.PRIORITY_HASH_K}) % 1048576)
               // GREATEST(CAST(n_chars AS BIGINT), 1) AS sample_key
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, weight, sample_key,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY sample_key ASC, doc_id ASC) AS BIGINT) AS rnk
      FROM s
    )
    SELECT doc_id, source, weight, sample_key, rnk FROM r WHERE rnk <= 20
    """,
)
def x58_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling per source (operators/pipeline
    .weighted_priority_sample): integer priority keys h // weight —
    larger docs proportionally likelier — bottom-20 per source. No
    float pow/log anywhere, so the sampled set is bit-reproducible
    across engines/retries; the oracle replays the arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return P.weighted_priority_sample(docs, k=20)


def _x59_semdedup_sql(sf_dir: str) -> str:
    """Full DuckDB replay of SemDeDup (r9, rows-only → hard oracle):
    builder-retrained centroid literals (the x18 recipe), the same
    left-fold assignment CTEs, within-cluster pair mining as an
    equi-join on list_id with the fold dot product ≥ threshold —
    bit-equal to the Arrow stage's order-pinned vectorized folds
    (similarity._fold_dots_np) — and min-id connected components as a
    recursive CTE (the x20 pattern). The only non-SQL step left is
    the bounded seeded training, replayed by the builder itself."""
    from sql_engine_spark.matrix.ext import (
        _assign_ctes,
        _dlit,
        _dot,
        _trained_centroids,
    )
    from sql_engine_spark.operators.similarity import ANN_SEED

    C = _trained_centroids(sf_dir, n_lists=8, seed=ANN_SEED)
    return f"""
    WITH RECURSIVE {_assign_ctes(C)},
    dup AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM asg x JOIN asg y ON x.list_id = y.list_id AND x.vec_id < y.vec_id
      WHERE {_dot("x.uv", "y.uv")} >= {_dlit(0.4)}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup
    ),
    reach(id, lbl) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
    )
    SELECT id AS vec_id, MIN(lbl) AS component,
           CAST(id = MIN(lbl) AS BIGINT) AS kept
    FROM reach GROUP BY id
    """


@query("x59_semantic_dedup", oracle_builder=_x59_semdedup_sql)
def x59_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup, Abbas et al.
    2023): spherical-quantizer clusters restrict the exact cosine pair
    search to within-cluster self-joins (O(N²/k) worst case, not
    O(N²)); connected components pick one representative per semantic
    cluster. HARD oracle since r9 (_x59_semdedup_sql): the r9
    order-pinned vectorized folds make the Arrow assignment and the
    pair-threshold decisions bit-replayable, the centroids embed as
    builder-retrained literals, and the CC fixpoint replays as a
    recursive CTE; n_lists=1 exactness and clustered recall stay
    pytest-proven."""
    from sql_engine_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, n_lists=8)


# x60's quantizer size and refinement depth — ONE definition consumed
# by the matrix entry, the oracle builder's replay, and the docstring
# claims, so a retune cannot desync operator from oracle.
X60_LISTS = 8
X60_ITERS = 4


def _x60_kmeans_sql(sf_dir: str) -> str:
    """Full DuckDB replay of the distributed Lloyd's refinement (r9,
    rows-only → hard oracle): the builder replays all X60_ITERS
    iterations sequentially via the SHARED similarity._kmeans_replay_np
    (one implementation with the bit-equality test) — legal because
    every cross-engine sum is a micro-unit BIGINT partial
    (order-independent, so the distributed aggregation produces the
    same integers), unit vectors and centroid dots are order-pinned
    folds, and the k·d driver update is the same Python either way.
    The oracle SQL then replays only the final assignment and the
    micro-unit mean_cos report against the embedded final centroids."""
    import numpy as np

    from sql_engine_spark.matrix.ext import (
        _assign_ctes,
        _load_embeddings_np,
        _trained_centroids,
    )
    from sql_engine_spark.operators.similarity import (
        ANN_SEED,
        _fold_norms_np,
        _kmeans_replay_np,
    )

    _ids, X = _load_embeddings_np(sf_dir)
    C0 = _trained_centroids(sf_dir, n_lists=X60_LISTS, seed=ANN_SEED)
    nrm = _fold_norms_np(X)
    U = X / np.where(nrm > 0, nrm, 1.0)[:, None]
    C = _kmeans_replay_np(U, C0, X60_ITERS)
    return f"""
    WITH {_assign_ctes(C)}
    SELECT list_id, COUNT(*) AS n_vectors,
           (CAST(SUM(CAST(floor(list_max(dots)*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
            / 1000000.0) / COUNT(*) AS mean_cos
    FROM asg GROUP BY list_id
    """


@query("x60_kmeans_refine", oracle_builder=_x60_kmeans_sql)
def x60_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's refinement (operators/similarity
    .kmeans_refine): 4 rounds of scan-stage assignment + map-side
    (cluster, dim) partial means; only k·d tiny integers ever shuffle
    or reach the driver. Per-cluster size and tightness report.
    HARD oracle since r9 (_x60_kmeans_sql): micro-unit fixed-point
    partials make each iteration's distributed sums bit-equal to the
    builder's sequential replay, so the final centroids embed as
    literals and the report replays in DuckDB; pytest additionally
    proves bit-equality to the numpy mirror from the same seeded
    init."""
    from sql_engine_spark.operators.similarity import kmeans_refine

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_refine(emb, n_lists=X60_LISTS, iterations=X60_ITERS)
