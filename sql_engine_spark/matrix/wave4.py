"""Round-3 wave 4: batched retrieval + embedding-space labeling over
``embeddings`` (x48, x49 — first use of the ``label`` column) and two
more curation signals over ``documents`` (x50 corpus-derived stopwords,
x51 verbatim span duplication).

Same exactness rules as core/ext/pipe/wave3: identical left-to-right
float folds on both engines (Spark ``F.aggregate`` vs DuckDB
``list_reduce``), counts/ranks cast BIGINT on both sides, ties broken
on unique integer ids, one final double division, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.catalog import load_table
from sql_engine_spark.matrix import query
from sql_engine_spark.matrix.ext import _dot

_SCORED_CTE = f"""
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
s AS (
  SELECT qid, vec_id, {_dot('ev', 'qv')} AS dp,
         {_dot('ev', 'ev')} AS na, {_dot('qv', 'qv')} AS nb
  FROM e, q WHERE vec_id <> qid
),
c AS (
  SELECT qid, vec_id,
         CASE WHEN sqrt(na)*sqrt(nb) <> 0.0 THEN dp/(sqrt(na)*sqrt(nb)) END AS cosine_sim
  FROM s
),
r AS (
  SELECT qid, vec_id, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine_sim DESC NULLS LAST, vec_id ASC) AS BIGINT) AS rnk
  FROM c
)
"""


@query(
    "x48_multi_query_topk",
    oracle=f"""
    WITH {_SCORED_CTE}
    SELECT qid, vec_id, cosine_sim, rnk FROM r WHERE rnk <= 10
    """,
)
def x48_multi_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact retrieval (operators/similarity.multi_query_topk):
    cosine top-10 for every query in the ``vec_id % 50 == 0`` query set
    in ONE corpus scan — broadcast query set, per-side norms computed
    once, only narrow (qid, id, score) triples shuffle for the
    per-query window top-k."""
    from sql_engine_spark.operators.similarity import multi_query_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return multi_query_topk(emb, k=10)


@query(
    "x49_knn_classify",
    oracle=f"""
    WITH {_SCORED_CTE},
    v AS (
      SELECT r.qid, CAST(emb.label AS BIGINT) AS nl, COUNT(*) AS votes
      FROM r JOIN embeddings emb ON emb.vec_id = r.vec_id
      WHERE r.rnk <= 10 GROUP BY r.qid, emb.label
    ),
    p AS (
      SELECT qid, nl, CAST(votes AS BIGINT) AS votes,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, nl ASC) AS rr
      FROM v
    )
    SELECT p.qid, CAST(t.label AS BIGINT) AS true_label,
           p.nl AS pred_label, p.votes
    FROM p JOIN embeddings t ON t.vec_id = p.qid
    WHERE p.rr = 1
    """,
)
def x49_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction (operators/similarity.knn_classify):
    majority label of the 10 exact nearest neighbors per query (ties →
    smallest label) next to the true label — the embedding-space
    labeling-consistency check / pseudo-labeling building block. First
    matrix use of ``embeddings.label``."""
    from sql_engine_spark.operators.similarity import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_classify(emb, k=10)


@query(
    "x50_stopword_stats",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS dfc FROM toks GROUP BY t),
    stop AS (SELECT t FROM dfreq ORDER BY dfc DESC, t ASC LIMIT 20),
    per AS (
      SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN stop.t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
      FROM toks LEFT JOIN stop ON toks.t = stop.t
      GROUP BY toks.doc_id
    )
    SELECT doc_id, n_tokens, n_stop,
           CASE WHEN n_tokens > 0
                THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE)
                ELSE 0.0 END AS stop_ratio
    FROM per
    """,
)
def x50_stopword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived stopword list (top-20 by document frequency,
    lexicographic ties) + per-document stopword ratio
    (operators/text.stopword_stats) — the language-agnostic quality
    signal computed when no hand list fits the corpus."""
    from sql_engine_spark.operators.text import stopword_stats

    docs = load_table(spark, sf_dir, "documents")
    return stopword_stats(docs, top_n=20)


@query(
    "x51_span_dups",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sp AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 8
                  THEN list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] for i in range(1, len(w)-6)])
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM tok
    ),
    inv AS (SELECT doc_id, unnest(s) AS g FROM sp)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_spans
    FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def x51_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim span duplication (operators/pipeline.span_dup_pairs):
    doc pairs sharing ≥1 identical 8-token run, with the exact count of
    distinct shared spans — the scalable analogue of exact-substring
    dedup (suffix-array method of Lee et al., ACL 2022), reusing the
    persisted shingle index at n=8."""
    from sql_engine_spark.operators.pipeline import span_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return span_dup_pairs(docs, window=8)


# ---------------------------------------------------------------------
# Wave 4b: stratified quality, cluster accounting, incremental dedup
# ---------------------------------------------------------------------

from sql_engine_spark.matrix.ext import _JACCARD_PAIRS_CTE, _STOP_LIST  # noqa: E402
from sql_engine_spark.matrix.pipe import _SHINGLES_ALL_CTE  # noqa: E402


@query(
    "x52_quality_stratified",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    s AS (
      SELECT doc_id, source,
             CAST(len(list_filter(w, x -> list_contains({_STOP_LIST}, x))) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS stopword_ratio,
             CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio,
             least(1.0, CAST(len(w) AS DOUBLE) / 50.0) AS len_score
      FROM t
    ),
    q AS (
      SELECT doc_id, source,
             0.5*stopword_ratio + 0.3*len_score + 0.2*distinct_ratio AS quality_score
      FROM s
    ),
    r AS (
      SELECT doc_id, source, quality_score,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY quality_score ASC, doc_id ASC) AS q_pct
      FROM q
    )
    SELECT doc_id, source, quality_score, q_pct,
           CAST(CASE WHEN q_pct >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM r
    """,
)
def x52_quality_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile normalization (operators/pipeline
    .quality_stratified): rank quality WITHIN each source and keep the
    top half of every source — the stratified filter that replaces a
    global threshold (domains have different score distributions).
    percent_rank = (rank−1)/(n−1) from int64 counters with a unique
    (score, id) order → bit-identical doubles on both engines."""
    from sql_engine_spark.operators.pipeline import quality_stratified

    docs = load_table(spark, sf_dir, "documents")
    return quality_stratified(docs, keep_frac=0.5)


@query(
    "x53_dup_cluster_stats",
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
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id),
    tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents)
    SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(c.doc_id) AS rep_doc,
           CAST(SUM(tk.nt) AS BIGINT) AS total_tokens,
           CAST(SUM(tk.nt) - arg_min(tk.nt, c.doc_id) AS BIGINT) AS dup_tokens
    FROM comp c JOIN tk USING (doc_id)
    GROUP BY c.component
    HAVING COUNT(*) >= 2
    """,
)
def x53_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster accounting (operators/pipeline
    .dup_cluster_stats): connected components over the memoized pair
    graph → per-cluster size, representative (kept) doc, total tokens,
    and tokens a dedup deletes — the "bytes saved" report of a
    production dedup run. Oracle = recursive-CTE reachability (x20's)
    + arg_min aggregation."""
    from sql_engine_spark.operators import dedup as D
    from sql_engine_spark.operators.pipeline import dup_cluster_stats

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    return dup_cluster_stats(docs, pairs)


@query(
    "x54_incremental_dedup",
    oracle=f"""
    WITH {_SHINGLES_ALL_CTE},
    newd AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0 AND len(s) > 0),
    oldd AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0 AND len(s) > 0),
    inva AS (SELECT doc_id, unnest(s) AS g FROM newd),
    invb AS (SELECT doc_id, unnest(s) AS g FROM oldd),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
      FROM inva a JOIN invb b ON a.g = b.g
    ),
    pairs AS (
      SELECT c.id_new, c.id_old,
             CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
               / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE) AS jaccard
      FROM cand c JOIN newd x ON x.doc_id = c.id_new JOIN oldd y ON y.doc_id = c.id_old
    )
    SELECT id_new, id_old, jaccard FROM pairs WHERE jaccard >= 0.8
    """,
)
def x54_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection (operators/pipeline
    .incremental_jaccard_pairs): Jaccard ≥ 0.8 pairs between the NEW
    batch (doc_id % 10 == 0 — today's crawl) and the EXISTING corpus,
    probing only the new docs' rarest-first prefixes into the corpus's
    df-ordered positional index (two-sided PPJoin positional prune) —
    the production shape that never re-dedups the whole corpus per
    ingest. The oracle is the plain two-sided inverted-index join."""
    from sql_engine_spark.operators.pipeline import incremental_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return incremental_jaccard_pairs(docs, threshold=0.8, new_mod=10)


@query(
    "x55_crossmodal_agreement",
    oracle=f"""
    WITH {_JACCARD_PAIRS_CTE},
    lex AS (SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.8),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nn AS (SELECT vec_id, v, {_dot('v', 'v')} AS nrm FROM e),
    pp AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CASE WHEN sqrt(a.nrm)*sqrt(b.nrm) <> 0.0
                  THEN {_dot('a.v', 'b.v')}/(sqrt(a.nrm)*sqrt(b.nrm)) END AS cosine_sim
      FROM nn a JOIN nn b ON a.vec_id < b.vec_id
    ),
    sem AS (SELECT id_a, id_b, cosine_sim FROM pp WHERE cosine_sim >= 0.4)
    SELECT COALESCE(l.id_a, s.id_a) AS id_a, COALESCE(l.id_b, s.id_b) AS id_b,
           l.jaccard, s.cosine_sim,
           CASE WHEN l.id_a IS NOT NULL AND s.id_a IS NOT NULL THEN 'both'
                WHEN l.id_a IS NOT NULL THEN 'lexical_only'
                ELSE 'semantic_only' END AS agreement
    FROM lex l FULL OUTER JOIN sem s ON l.id_a = s.id_a AND l.id_b = s.id_b
    """,
)
def x55_crossmodal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup agreement audit (operators/pipeline
    .crossmodal_dup_agreement): lexical (Jaccard ≥ 0.8) vs semantic
    (cosine ≥ 0.4) near-dup pairs full-outer joined and tagged both /
    lexical_only / semantic_only — the check that an embedding space
    reflects textual duplication before semantic dedup is trusted.
    On this corpus the embeddings are text-independent and the audit
    shows it (both ≈ 0) — which is the finding."""
    from sql_engine_spark.operators.pipeline import crossmodal_dup_agreement

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return crossmodal_dup_agreement(docs, emb)
