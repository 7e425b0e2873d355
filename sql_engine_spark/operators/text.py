"""Tier X text-analysis operators over the ``documents`` table
(SURVEY.md §2.3 — not present in the reference; mandated by
BASELINE.json's LLM-data-pipeline north star).

Everything here is pure Spark SQL expressions (whole-stage codegen, no
Python UDFs): token ops are array functions over ``split(text, ' ')``,
scores are deterministic arithmetic, fingerprints are built-in hashes.
Each helper is written so the identical computation is expressible in
ANSI SQL for the DuckDB oracle (list_filter/list_contains mirror
F.filter/isin, md5 matches md5, etc.).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-vote language
# heuristic. Deliberately small and hard-coded: the oracle SQL carries
# the same lists, so they are part of the operator's contract.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "des", "un"),
    "zh": ("的", "是", "了"),
}

# Flat stopword list for the quality score's stopword-ratio component.
STOPWORDS: tuple[str, ...] = tuple(w for ws in LANG_STOPWORDS.values() for w in ws)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenizer. The corpus is single-space separated; a
    production corpus would use ``F.split(c, r'\\s+')`` plus a BPE-ish
    regex pass — same plan shape."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def count_in(arr: Column, vocab: tuple[str, ...]) -> Column:
    """# tokens of ``arr`` that appear in ``vocab`` (with multiplicity)."""
    return F.size(F.filter(arr, lambda t: t.isin(*vocab)))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: total / distinct tokens, char count, mean token
    length. All computable from the scan with zero shuffles."""
    w = tokens(text_col)
    n = F.size(w)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars"),
        (F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double") / n).alias("mean_token_len"),
    )


def quality_expr(text_col: Column | str) -> Column:
    """The quality-score COLUMN (0.5·stopword_ratio + 0.3·min(1, n/50)
    + 0.2·distinct_ratio) — exposed as a bare expression so composed
    pipelines (x40 funnel) can fuse it into their own scan instead of
    paying a join against :func:`quality_score`'s output."""
    w = tokens(text_col)
    n = F.size(w).cast("double")
    stop_ratio = count_in(w, STOPWORDS).cast("double") / n
    len_score = F.least(F.lit(1.0), n / F.lit(50.0))
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n
    return F.lit(0.5) * stop_ratio + F.lit(0.3) * len_score + F.lit(0.2) * distinct_ratio


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0, 1]:
    0.5 * stopword_ratio + 0.3 * min(1, n_tokens/50) + 0.2 * distinct_ratio.

    The components are the standard cheap text-quality signals
    (length, stopword density, repetition); the exact weights are the
    operator contract, mirrored in the oracle SQL.
    """
    w = tokens(text_col)
    n = F.size(w).cast("double")
    stop_ratio = count_in(w, STOPWORDS).cast("double") / n
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n
    return df.select(
        F.col(id_col),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality_expr(text_col).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: count hits per language list, pick the
    max with a fixed precedence order (en, es, de, fr, zh) on ties.
    Pure expression → runs in the scan stage, no shuffle."""
    w = tokens(text_col)
    scores = {lang: count_in(w, words) for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    pred: Column = F.lit(langs[-1])
    # Build CASE from lowest to highest precedence: en wins ties.
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    cols = [F.col(id_col)] + [scores[lang].alias(f"score_{lang}") for lang in langs]
    return df.select(*cols, pred.alias("predicted_lang"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``md5_fp``: md5 of the normalized (lower, trimmed) text — the
      exact-dedup key; identical to any other engine's md5.
    - ``poly_fp``: 31-ary rolling/polynomial hash over character codes
      mod 2^31-1 — an order-sensitive structural fingerprint computed
      with ``F.aggregate`` (left fold), expressible as list_reduce in
      the oracle. Values stay < 2^36 so ANSI long arithmetic never
      overflows.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    chars = F.transform(
        F.filter(F.split(norm, ""), lambda ch: ch != ""),
        lambda ch: F.ascii(ch).cast("long"),
    )
    poly = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(2147483647),
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("md5_fp"),
        poly.alias("poly_fp"),
    )


# Corpus-tuned polarity lexicon for the sentiment operator (the classic
# lexicon-based approach — EDBT 2016 sentiment-on-Spark pattern; see
# PAPERS.md). Weights are the operator contract, mirrored in oracle SQL.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 2,
    "small": 1,
    "big": 1,
    "slow": -2,
    "dup": -1,
}


def sentiment_score(
    df: DataFrame,
    lexicon: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexicon-based sentiment: Σ count(word)·weight over the polarity
    lexicon, plus positive/negative hit counts. The lexicon folds into
    the plan as literals (a broadcast-join against a lexicon TABLE is
    the shape for 100k-word lexicons; for small lexicons literal
    folding keeps everything in the scan stage with zero shuffles)."""
    lex = SENTIMENT_LEXICON if lexicon is None else lexicon
    w = tokens(text_col)
    score: Column = F.lit(0)
    pos: Column = F.lit(0)
    neg: Column = F.lit(0)
    for word, weight in lex.items():
        hits = count_in(w, (word,))
        score = score + hits * F.lit(weight)
        if weight > 0:
            pos = pos + hits
        else:
            neg = neg + hits
    return df.select(
        F.col(id_col),
        pos.cast("long").alias("pos_hits"),
        neg.cast("long").alias("neg_hits"),
        score.cast("long").alias("sentiment"),
    )


def stopword_stats(
    df, top_n: int = 20, id_col: str = "doc_id", text_col: str = "text"
):
    """Corpus-derived stopword list + per-document stopword ratio.

    The stopword list is DATA-derived (top ``top_n`` tokens by document
    frequency, ties broken lexicographically) — the language-agnostic
    quality signal a curation pipeline computes when no hand list fits
    the corpus. Two passes: (1) one token explode → df counts → top-n
    (a tiny total order); (2) the same explode joined (broadcast — the
    list is ``top_n`` rows by construction) → per-doc counts. Ratio is
    the single final double division; everything before it is exact
    integers.

    Output: (doc_id, n_tokens, n_stop, stop_ratio).
    """
    from pyspark.sql import functions as F

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    dfreq = toks.groupBy("t").agg(F.count_distinct(F.col(id_col)).alias("dfc"))
    stop = dfreq.orderBy(F.col("dfc").desc(), F.col("t").asc()).limit(top_n).select("t")
    flagged = toks.join(
        F.broadcast(stop.withColumn("__is_stop", F.lit(1))), "t", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.coalesce(F.sum("__is_stop"), F.lit(0)).cast("long").alias("n_stop"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_stop",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"),
        ).otherwise(F.lit(0.0)).alias("stop_ratio"),
    )


def phrase_stats(
    df: DataFrame,
    n: int = 3,
    top: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus phrase mining: the ``top`` word-``n``-grams ranked by
    document frequency (then total occurrences, then phrase — a total
    deterministic order). Unlike the dedup shingle index this counts
    OCCURRENCES (no per-doc distinct), which is what boilerplate /
    template detection needs: a phrase appearing 40× in one doc and
    once elsewhere is a repetition artifact, not corpus boilerplate,
    and only the (n_docs, n_occurrences) pair separates the two.

    Plan: scan-stage n-gram expression → one explode → ONE groupBy
    (map-side combinable counts + count_distinct via a two-column
    rollup) → global top-``top`` via TakeOrderedAndProject (no full
    sort). At 100 TB the (phrase) key space is Zipfian — the map-side
    partial aggregation absorbs the head before the shuffle.

    Output: (phrase, n_docs, n_occurrences) — exactly ``top`` rows.
    """
    w = tokens(text_col)
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("phrase"))
    per_doc = occ.groupBy("phrase", "id").agg(F.count(F.lit(1)).alias("c"))
    stats = per_doc.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("c").alias("n_occurrences"),
    )
    return stats.orderBy(
        F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("phrase").asc()
    ).limit(top)
