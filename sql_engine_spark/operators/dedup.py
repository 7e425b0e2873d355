"""Tier X deduplication operators (SURVEY.md §2.3): exact, n-gram
Jaccard, MinHash LSH, SimHash. Not present in the reference (its only
dedup is SELECT DISTINCT via an O(n²) list scan, reference
sqlengine.py:375-377); these are the LLM-pipeline operators mandated by
BASELINE.json, designed for 100 TB:

- exact dedup = hash aggregate on a key (map-side partials, one shuffle)
- n-gram Jaccard = inverted-index self-join on shingles (candidates are
  only pairs sharing ≥1 shingle — never the O(n²) cross product)
- MinHash LSH = Spark ML banding, the sub-quadratic scale path
- SimHash = 64-bit signature via xxhash64, banded for candidate gen

All-pairs exact scoring stays exact because Jaccard is computed from
distinct-shingle intersection counts produced by the join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_engine_spark.operators.text import tokens


def exact_dedup(df: DataFrame, keys: list[str], tiebreak: str) -> DataFrame:
    """Keep exactly one row per key group: the row with the smallest
    ``tiebreak`` value (deterministic, unlike ``dropDuplicates`` which
    keeps an arbitrary row). One shuffle on ``keys``; at scale this is
    the standard hash-partitioned window dedup, and AQE splits skewed
    key groups."""
    w = Window.partitionBy(*keys).orderBy(F.col(tiebreak).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-tokenized text.
    Pure array expression (no UDF): slice the token array at every
    offset and join with spaces."""
    w = tokens(text)
    sz = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(0), sz - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted index.

    Plan: shingle each doc → explode → self-equi-join on the shingle
    (only docs sharing a shingle ever meet — a real join, not a cross
    product) → count shared distinct shingles per pair → Jaccard =
    |∩| / (|A| + |B| - |∩|) → threshold.

    Scale notes: the shuffle key is the shingle; a shingle occurring in
    m docs contributes m(m-1)/2 candidate pairs, so ultra-hot shingles
    are the skew risk — AQE skew-join handles moderate skew, and the
    sub-quadratic path for true 100 TB corpora is :func:`minhash_lsh_pairs`.
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    ex = sh.select("id", "sz", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_by_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop every doc that has a near-duplicate with a smaller id
    (single-pass canonicalization: keeps the minimum-id representative
    of each duplicate *pair*; chains longer than one hop keep their
    local minima — full connected components is an iterative
    large-star/small-star job, intentionally out of this operator).
    Implemented as a left-anti join: no collect, two shuffles."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash + banding (Spark ML
    MinHashLSH): shingle → hash-features → minhash signatures → OR-ed
    band buckets → approxSimilarityJoin. Sub-quadratic candidate
    generation — the 100 TB path. Seeded → deterministic signatures,
    but the candidate set is still approximate (banding may miss pairs
    near the threshold), so this op is correctness-checked by recall
    tests against :func:`ngram_jaccard_pairs`, not a SQL oracle.

    Output: (id_a, id_b, jaccard_est) with id_a < id_b, where
    jaccard_est = 1 - lsh_distance (ML reports Jaccard *distance*).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (F.lit(1.0) - F.col("dist")).alias("jaccard_est"),
        )
    )


# --- SimHash -----------------------------------------------------------

_SIMHASH_BITS = 64
_BAND_BITS = 16  # 4 bands of 16 bits: candidates agree on ≥1 band → hamming ≤ 48 guaranteed caught... bands catch hamming ≤ 3 with high prob


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """64-bit SimHash per document, entirely in JVM expressions.

    Features are distinct word n-gram shingles (raw tokens are far too
    coarse on small-vocabulary corpora — every doc shares most words);
    each shingle hashes with xxhash64, and bit j of the signature is
    the sign of Σ_shingles (2·bit_j(hash) − 1). Emitted as 4 × 16-bit
    bands (ints) for LSH banding."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("t"))
    h = F.xxhash64("t")
    bit_sums = [
        F.sum(F.when(F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    sums = toks.groupBy("id").agg(*bit_sums)
    band_cols = []
    for band in range(_SIMHASH_BITS // _BAND_BITS):
        expr = F.lit(0).cast("long")
        for off in range(_BAND_BITS):
            j = band * _BAND_BITS + off
            expr = expr + F.when(F.col(f"b{j}") > 0, F.lit(1 << off).cast("long")).otherwise(F.lit(0).cast("long"))
        band_cols.append(expr.alias(f"band{band}"))
    return sums.select(F.col("id"), *band_cols)


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3, n: int = 3
) -> DataFrame:
    """SimHash near-dup candidate pairs: docs sharing any 16-bit band
    (banded LSH join — by pigeonhole, any pair with hamming ≤ 3 shares
    at least one of the 4 bands, so recall is exact for the ≤3 regime),
    then exact hamming distance filter via bit_count(xor).

    Output: (id_a, id_b, hamming), id_a < id_b.
    """
    sig = simhash_signatures(df, id_col, text_col, n)
    n_bands = _SIMHASH_BITS // _BAND_BITS
    cands = None
    for band in range(n_bands):
        a, b = sig.alias("a"), sig.alias("b")
        c = a.join(
            b, (F.col(f"a.band{band}") == F.col(f"b.band{band}")) & (F.col("a.id") < F.col("b.id"))
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            *[F.col(f"a.band{i}").alias(f"x{i}") for i in range(n_bands)],
            *[F.col(f"b.band{i}").alias(f"y{i}") for i in range(n_bands)],
        )
        cands = c if cands is None else cands.unionByName(c)
    ham = None
    for i in range(n_bands):
        term = F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
        ham = term if ham is None else ham + term
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
