"""Sketch-based data profiling — engine extension (SURVEY.md §2.3).

The profiling pass a training-data pipeline runs before anything else:
per-column approximate distinct counts, quantiles, and heavy hitters.
At 100 TB none of these can be exact-and-cheap at the same time, so the
operator uses mergeable one-pass sketches — since r9 the repo's own
portable (cross-engine bit-replayable) ones:

- **HyperLogLog** — the repo's PORTABLE-register HLL (below) for the
  profile and x30 (SQL-replayable, hard-oracle); the DataSketches
  binaries (``hll_sketch_agg``/``hll_union_agg``) remain available via
  :func:`mergeable_distinct` for binary-sketch interop.
- **Quantile sketch** — a portable integer HDR histogram (constants
  below): geometric octaves + linear sub-buckets over exact cents,
  order-independent integer counts, relative error ≤ 2^-SUB_BITS.
- **Heavy hitters** via a single MELTED pass: every categorical column
  explodes to (column, value) rows inside the scan stage, one
  groupBy(column, value) counts them all (partial aggregation keeps
  shuffle volume at the SUM of per-column distincts), and a min over
  (-count, value) structs picks winners — no window, no join.

The profile of a 100 TB table costs exactly TWO scans, independent of
column count: one melted scan for every numeric sketch (bins +
registers in one stack()), one melted scan for every categorical
heavy hitter — asserted in tests/test_plans.py. Since r9 every
profile output value is deterministic and SQL-replayable, so x29 is a
hard DuckDB-oracle row; accuracy bounds vs exact recomputation are
additionally asserted in tests/test_sketches.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- portable HDR-histogram quantile sketch (r9) ---------------------
# Quantiles in the profile come from an integer HDR histogram (HDR
# Histogram / DDSketch family: geometric octaves with linear
# sub-buckets), not Spark's internal Greenwald-Khanna sketch — GK's
# compaction state is engine-internal and not SQL-replayable, which
# kept x29 the last rows-only oracle entry. The HDR bin index is PURE
# INTEGER arithmetic over the repo's exact cents fixed point
# (floor(v*100+0.5), the money/x31 pattern): octave = bit length
# (length(bin(x)) on both engines — the x30 rank idiom, no libm
# anywhere), sub-bucket = top QUANTILE_SUB_BITS mantissa bits. Bin
# counts are order-independent integer sums, so the distributed
# aggregation is bit-equal to any sequential replay, and the whole
# sketch — binning, rank walk, representative value — replays in
# DuckDB. Error: relative error of the reported quantile is
# <= 2^-QUANTILE_SUB_BITS (bin width / bin lower bound), asserted in
# tests/test_sketches.py. State: <= ~64*2^SUB_BITS bins per column
# regardless of data size — mergeable bounded sketch state, same
# contract as the HLL registers.
QUANTILE_SUB_BITS = 7  # 128 sub-buckets/octave → rel. error <= 0.79%
_QSB = 1 << QUANTILE_SUB_BITS
CENTS_SCALE = 100  # fixed-point scale for profiled numerics


def hdr_bin_sql(v: str, duck: bool = False) -> str:
    """HDR bin id of non-negative-or-mirrored cents value ``v`` as a
    SQL fragment — the SAME shape on both engines (only the shift /
    integer-div / bit-length spellings differ), so the operator and
    the x29 oracle cannot desync. Values |v| < 2^SUB_BITS get exact
    unit bins; larger values (octave * 2^SUB_BITS + sub) with sub =
    the SUB_BITS bits after the leading 1; negatives mirror
    (bin = -bin(|v|)), keeping bin order == value order. Integer ops
    only — bit-stable everywhere."""
    a = f"abs({v})"
    o = _bitlen_sql(a, duck)  # bit length; a=0 takes the unit branch
    shift = f"({o} - {1 + QUANTILE_SUB_BITS})"
    top = f"({a} >> {shift})" if duck else f"shiftright({a}, {shift})"
    pos = f"(CASE WHEN {a} < {_QSB} THEN {a} ELSE {o} * {_QSB} + {top} - {_QSB} END)"
    return f"(CASE WHEN {v} >= 0 THEN {pos} ELSE -{pos} END)"


def hdr_lower_bound_sql(b: str, duck: bool = False) -> str:
    """Representative (lower-bound) cents value of HDR bin ``b`` — the
    inverse of :func:`hdr_bin_sql` up to bin width; negative bins
    report the mirrored (upper) endpoint, same relative error."""
    a = f"abs({b})"
    oct_ = f"({a} // {_QSB})" if duck else f"({a} DIV {_QSB})"
    base = f"({_QSB} + {a} % {_QSB})"
    shift = f"({oct_} - {1 + QUANTILE_SUB_BITS})"
    big = f"({base} << {shift})" if duck else f"shiftleft({base}, {shift})"
    pos = f"(CASE WHEN {a} < {(1 + QUANTILE_SUB_BITS) * _QSB} THEN {a} ELSE {big} END)"
    return f"(CASE WHEN {b} >= 0 THEN {pos} ELSE -{pos} END)"


def cents_sql(v: str) -> str:
    """Exact fixed-point cents of ``v`` — the repo-wide
    floor(x*100+0.5) tie rule (functions/money.py), multiply/add/floor
    are IEEE-correctly-rounded on every engine."""
    return f"CAST(floor({v} * {CENTS_SCALE} + 0.5) AS BIGINT)"


def _bitlen_sql(a: str, duck: bool) -> str:
    """Bit length of non-negative BIGINT ``a`` (the x30 rank idiom):
    Spark bin() prints the minimal binary form, DuckDB pads — ltrim
    equalizes."""
    return (
        f"length(ltrim(bin({a}), '0'))" if duck else f"length(bin({a}))"
    )


def hll_hash_sql(v: str, duck: bool = False) -> str:
    """The portable 60-bit md5-prefix hash of ``v`` rendered as a
    string (the x04/x05/x30 family) as a SQL fragment on either
    engine. NULL in → NULL out. DuckDB side parses the 15 hex chars
    via the '0x…'::BIGINT cast — bit-identical to the old per-char
    strpos fold (verified over 2.5M varied inputs) and ~11× faster
    (measured, r9); 60 bits always fit signed int64, no sign risk."""
    if duck:
        return f"(('0x' || substr(md5(CAST({v} AS VARCHAR)), 1, 15))::BIGINT)"
    return f"CAST(conv(substring(md5(CAST({v} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def hll_idx_sql(h: str) -> str:
    """Register index of hash ``h`` — low HLL_P bits (same spelling on
    both engines; ``h`` is non-negative so ``%`` == bitmask)."""
    return f"({h} % {HLL_M})"


def _rank_from_w_sql(w: str, duck: bool = False) -> str:
    """Leading-zero rank of a 48-bit hash window ``w`` — the register
    value the HLL max-folds. Monotone NON-INCREASING in ``w`` (bit
    length is monotone), so ``max(rank) == rank(min(w))`` and callers
    may min-fold the raw window first, running this string-op
    expression once per register instead of once per row."""
    return (
        f"(CASE WHEN {w} = 0 THEN {_HLL_W + 1} "
        f"ELSE {_HLL_W + 1} - {_bitlen_sql(w, duck)} END)"
    )


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimated scan-task count for ``df``: optimizer-stats size (the
    column-pruned file-footer estimate — no job, no RDD conversion,
    sub-ms once the file index is warm) over maxPartitionBytes. Used
    only to decide whether a SMALL local input needs spreading, so the
    cheap estimate beats the exact-but-slow rdd.getNumPartitions()
    (which builds a Python RDD plan, ~0.5 s of driver time)."""
    spark = df.sparkSession
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        max_pb = _parse_size_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        return size // max(max_pb, 1) + 1
    except Exception:  # pragma: no cover - private-API drift fallback
        return df.rdd.getNumPartitions()


_SIZE_SUFFIX = {
    "": 1, "b": 1, "k": 1 << 10, "m": 1 << 20,
    "g": 1 << 30, "t": 1 << 40, "p": 1 << 50,
}


def _parse_size_bytes(v: str) -> int:
    """Spark byte-size conf string → bytes. Accepts every spelling
    Spark does ('134217728b', '128m', '1g', '128MB', bare digits,
    any case) — a human-set '128m' must not throw and silently send
    the caller down the slow rdd fallback."""
    s = str(v).strip().lower()
    num = s.rstrip("kmgtpb")
    return int(num) * _SIZE_SUFFIX[s[len(num):].rstrip("b")]


def profile_table(
    df: DataFrame, numeric_cols: list[str], categorical_cols: list[str]
) -> DataFrame:
    """One-pass sketch profile → one row per profiled column:
    (column, n_rows, approx_distinct, p50, p95, top_value, top_count).
    Quantiles are null for categoricals; top_value/top_count null for
    numerics (heavy hitters on high-cardinality numerics are rarely
    meaningful and would bloat reducer state).

    Quantile semantics (since the r9 HDR rewrite — ADVICE r9): p50/p95
    are HDR *bin lower bounds* over cents, not actual data values as
    ``percentile_approx`` returned — each is biased TOWARD ZERO by at
    most 2⁻⁷ relative error (one 128th-of-an-octave bin width).
    External callers must not assume data-valued quantiles."""
    if not numeric_cols and not categorical_cols:
        raise ValueError("profile_table: no columns to profile")
    profile = None
    if numeric_cols:
        # ONE melted scan for every numeric sketch: each row emits,
        # per column, an HDR-bin row (always — a NULL bin carries the
        # null count into n_rows) and an HLL-register row (non-null
        # values only; k2 carries the raw 48-bit hash window — the
        # leading-zero RANK is monotone non-increasing in w, so
        # max(rank) == rank(min(w)) and the string-op rank expression
        # runs once per REGISTER, not once per row). Everything
        # downstream aggregates bounded sketch state: groupBy(column,
        # kind, key) collapses each partition map-side to <=
        # bins+registers rows per column, and the final
        # groupBy(column) folds those few thousand rows into the
        # profile row with JVM array expressions — no Window, no
        # join, no driver collect. Every arithmetic step is integer or
        # lut'd (module comments), so the whole branch replays
        # bit-exactly in the x29 DuckDB oracle (matrix/ext.py).
        base = df.select(*dict.fromkeys(numeric_cols))
        # The per-row md5 is the profile's compute floor; a 100 TB
        # scan has thousands of input splits, but a small local file
        # may have fewer than the session has cores — spread it (the
        # guard keeps the repartition OUT of real at-scale plans).
        # The natural split count is ESTIMATED from optimizer stats
        # (pruned-size / maxPartitionBytes): rdd.getNumPartitions()
        # would answer exactly but materializes a Python RDD plan,
        # ~0.5 s of driver time per call (measured, r9).
        if _estimated_scan_partitions(base) < (
            par := df.sparkSession.sparkContext.defaultParallelism
        ):
            base = base.repartition(par)
        # Columns travel as int ids through the hot path (string group
        # keys measurably slow the melted partial agg; names come
        # back via one element_at over the final handful of rows).
        # Stages are single parsed SQL strings — fine-grained Column
        # building costs a py4j round-trip per node, ~1 s/plan here.
        # The melt is stack(), not explode(array(named_struct(...))):
        # stack emits flat primitive columns where explode allocates
        # an array of nested structs per row — measured ~15% faster
        # on the whole state agg (r9). Scalar pieces (cents, hash,
        # bin, register idx/window) are precomputed per column in
        # chained projections, so the Generate itself carries only
        # column references; the hash h{i} is materialized as its own
        # column BEFORE idx/window derive from it, so the md5 runs
        # once per value (expression CSE does NOT dedupe a repeated
        # subexpression across output fields; measured 3x slower
        # fused, r9 — the cents recompute inside the hash is two
        # cheap float ops and doesn't matter).
        nc = len(numeric_cols)
        hashed = base.selectExpr(
            *[f"{cents_sql(f'`{c}`')} AS v{i}" for i, c in enumerate(numeric_cols)],
            *[
                f"{hll_hash_sql(cents_sql(f'`{c}`'))} AS h{i}"
                for i, c in enumerate(numeric_cols)
            ],
        )
        keyed = hashed.selectExpr(
            *[f"CAST({hdr_bin_sql(f'v{i}')} AS BIGINT) AS b{i}" for i in range(nc)],
            *[f"CAST({hll_idx_sql(f'h{i}')} AS BIGINT) AS x{i}" for i in range(nc)],
            *[f"shiftright(h{i}, {HLL_P}) AS w{i}" for i in range(nc)],
        )
        # Two rows per (row, column): kind 0 = HDR bin (k1 NULL for a
        # NULL value — the null group still counts toward n_rows),
        # kind 1 = HLL register (k1 = register idx, k2 = raw 48-bit
        # hash window; NULL-k1 register rows are dropped — a NULL
        # value contributes nothing to the distinct estimate).
        parts = []
        for i in range(nc):
            parts.append(f"CAST({i} AS INT), CAST(0 AS INT), b{i}, CAST(NULL AS BIGINT)")
            parts.append(f"CAST({i} AS INT), CAST(1 AS INT), x{i}, w{i}")
        state = (
            keyed.selectExpr(
                f"stack({2 * nc}, {', '.join(parts)}) AS (ci, kind, k1, k2)"
            )
            .filter("kind = 0 OR k1 IS NOT NULL")
            .groupBy("ci", "kind", "k1")
            .agg(F.expr("count(1) AS cnt"), F.expr("min(k2) AS mw"))
        )
        per_col = state.groupBy("ci").agg(
            F.expr("sum(CASE WHEN kind = 0 THEN cnt END) AS n_rows"),
            F.expr(
                "coalesce(sum(CASE WHEN kind = 0 AND k1 IS NOT NULL "
                "THEN cnt END), CAST(0 AS BIGINT)) AS nn"
            ),
            F.expr(
                "sort_array(collect_list(CASE WHEN kind = 0 AND k1 IS NOT NULL "
                "THEN named_struct('b', k1, 'c', cnt) END)) AS bins"
            ),
            F.expr(
                "coalesce(sum(CASE WHEN kind = 1 THEN "
                f"shiftleft(CAST(1 AS BIGINT), {_HLL_W + 1} - {_rank_from_w_sql('mw')}) "
                "END), CAST(0 AS BIGINT)) AS sp"
            ),
            F.expr("count(CASE WHEN kind = 1 THEN 1 END) AS nr"),
        )
        # Left-to-right fold over the sorted bounded bin array picks
        # the first bin whose cumulative count reaches each ceil-rank
        # (rank_q = ceil(q*nn) in pure integers, formulas inlined and
        # pinned identically in the oracle).
        q = """
            aggregate(
              bins,
              named_struct('cum', CAST(0 AS BIGINT),
                           'b50', CAST(NULL AS BIGINT),
                           'b95', CAST(NULL AS BIGINT)),
              (acc, x) -> named_struct(
                'cum', acc.cum + x.c,
                'b50', coalesce(acc.b50,
                       CASE WHEN acc.cum + x.c >= (nn + 1) DIV 2
                            THEN x.b END),
                'b95', coalesce(acc.b95,
                       CASE WHEN acc.cum + x.c >= (95 * nn + 99) DIV 100
                            THEN x.b END)))
            """
        names = "array(" + ", ".join(f"'{c}'" for c in numeric_cols) + ")"
        profile = per_col.select(
            F.expr(f"element_at({names}, ci + 1) AS column"),
            F.col("n_rows"),
            F.floor(_hll_estimate_expr("sp", "nr")).cast("long").alias("approx_distinct"),
            F.expr(f"{q} AS q"),
        ).selectExpr(
            "column",
            "n_rows",
            "approx_distinct",
            f"CAST({hdr_lower_bound_sql('q.b50')} AS DOUBLE) / {CENTS_SCALE} AS p50",
            f"CAST({hdr_lower_bound_sql('q.b95')} AS DOUBLE) / {CENTS_SCALE} AS p95",
            "CAST(NULL AS STRING) AS top_value",
            "CAST(NULL AS BIGINT) AS top_count",
        )

    if categorical_cols:
        # Categorical columns never touch the sketch scan: MELT each
        # row to k (column, value) pairs scan-side, then ONE
        # groupBy(column, value). Partial aggregation collapses each
        # input partition to its per-column distincts before the
        # shuffle, so shuffle volume is bounded by the SUM of
        # per-column cardinalities — not the PRODUCT a joint
        # (c1, …, ck) tuple-group would carry, which regresses badly
        # when several independent mid-cardinality columns multiply
        # out (ADVICE r3). The k× melted rows exist only inside the
        # scan stage and never shuffle. From this (column, value,
        # count) relation, per-column distinct counts are EXACT
        # (marginal row count — better than the HLL estimate the
        # sketch scan would give), n_rows is the count sum, and the
        # heavy hitter is a min over (-count, value) structs — no
        # window sort, no join.
        counts = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("string").alias("top_value"),
                            )
                            for c in categorical_cols
                        ]
                    )
                ).alias("kv")
            )
            .groupBy("kv.column", "kv.top_value")
            .agg(F.count(F.lit(1)).alias("top_count"))
        )
        # NULL handling matches COUNT(DISTINCT col)/mode semantics: the
        # NULL group counts toward n_rows but is excluded from the
        # distinct count and can never be the heavy hitter (min over a
        # WHEN-guarded struct ignores the null-valued group).
        best = F.min(
            F.when(
                F.col("top_value").isNotNull(),
                F.struct(
                    (-F.col("top_count")).alias("nc"), F.col("top_value").alias("v")
                ),
            )
        )
        cat_profile = (
            counts.groupBy("column")
            .agg(
                F.sum("top_count").alias("n_rows"),
                F.count("top_value").cast("long").alias("approx_distinct"),  # exact
                best.alias("__best"),
            )
            .select(
                "column",
                "n_rows",
                "approx_distinct",
                F.col("__best")["v"].alias("top_value"),
                (-F.col("__best")["nc"]).alias("top_count"),
            )
        )
        cat_rows = cat_profile.select(
            "column",
            "n_rows",
            "approx_distinct",
            F.lit(None).cast("double").alias("p50"),
            F.lit(None).cast("double").alias("p95"),
            "top_value",
            "top_count",
        )
        profile = cat_rows if profile is None else profile.unionByName(cat_rows)
    return profile


def mergeable_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group DataSketches HLL + global union — the shard-then-merge
    shape: each group's sketch is a small binary that unions in O(sketch)
    without rescanning data. Returns one row per group plus a
    ``__total__`` row whose estimate comes from the *union of the group
    sketches*, not a second scan."""
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col).alias("sketch")
    )
    groups = per_group.select(
        F.col(group_col).cast("string").alias("group"),
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )
    total = per_group.agg(F.hll_union_agg("sketch").alias("u")).select(
        F.lit("__total__").alias("group"),
        F.hll_sketch_estimate("u").alias("approx_distinct"),
    )
    return groups.unionByName(total)


# --- portable-register HLL (r8, VERDICT r7 #7) -----------------------
# A from-scratch HyperLogLog whose register state is derived from the
# repo's PORTABLE 60-bit md5-prefix hash (the x04/x05 family,
# operators/dedup.py) instead of DataSketches binaries — so the whole
# sketch, union included, replays in DuckDB and x30 becomes a HARD
# oracle row. The estimator contains exactly ONE runtime float op: the
# constant/int64 division of the raw branch, which IEEE 754 rounds
# identically on every engine. The small-range linear-counting term
# m·ln(m/V) is NOT computed with a runtime ln — the r8 spike proved
# libm ln is platform-divergent (302 of the 4096 reachable inputs
# differ in the last bit between the JVM and DuckDB; pinned in
# tests/test_sketches.py) — but its input space is finite, so it is a
# 4096-entry precomputed table (HLL_LINEAR_LUT) formatted verbatim
# into both the Spark plan and the oracle SQL: bit-identical by
# construction AND platform-independent at 1000 executors, which a
# libm call never is. Flajolet et al. 2007 estimator shape; original
# implementation.

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_HLL_W = 60 - HLL_P  # rank window: the hash's remaining 48 bits
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# Scaled-integer harmonic domain: sum_j 2^-M_j * 2^(W+1) is an exact
# int64 (M_j <= W+1 = 49, so 4096 * 2^49 < 2^62) — no float
# accumulation order anywhere in the fold.
_HLL_SCALE = 1 << (_HLL_W + 1)
HLL_EST_CONST = HLL_ALPHA * HLL_M * HLL_M * float(_HLL_SCALE)
# m·ln(m/V) for V = 1..m. repr() round-trips doubles exactly and both
# engines parse decimal literals to nearest-double, so the value each
# engine computes is THIS value, not its libm's.
HLL_LINEAR_LUT = [float(HLL_M) * math.log(HLL_M / v) for v in range(1, HLL_M + 1)]


def hll_lut_sql() -> str:
    """The 4096-entry linear-counting lut as a Spark SQL fragment —
    ONE string literal decoded by from_json (an array(...) of 4096
    double literals costs ~0.4 s of eager-analysis driver time per
    plan build; the JSON decode runs only on the few estimate rows).
    repr round-trips exactly through Jackson's correctly-rounded
    parseDouble — pinned against the DuckDB literal spelling by
    test_portable_hll_linear_term_bitstable_over_entire_input_space."""
    lut_json = "[" + ", ".join(repr(x) for x in HLL_LINEAR_LUT) + "]"
    return f"from_json('{lut_json}', 'array<double>')"


def _hll_estimate_expr(sp: str, nr: str):
    """The estimator as ONE parsed expression over an exact-int64
    harmonic-sum expression ``sp`` and register-count expression
    ``nr`` — shared by the x30 per-group distinct and the x29
    profile's per-column distinct. Raw/linear-counting branches with
    bit-stable float ops only (module comment); callers pass a
    never-NULL ``sp``. Built as a single SQL string: fine-grained
    Column building costs a py4j round-trip per node (the 4096-F.lit
    lut alone measured ~5 s of driver time per plan build, r9); the
    'D' suffix forces DOUBLE parsing so each repr round-trips exactly
    (Spark's twin of the DuckDB 'e0' gotcha, matrix/ext._dlit).
    greatest() keeps the lut index valid under ANSI mode when the raw
    branch is the live one; element_at, not F.log — module comment.
    The lut travels as ONE string literal decoded by from_json
    (:func:`hll_lut_sql`), not an array(...) of 4096 double literals —
    eager analysis walks every literal node on each downstream
    DataFrame op, ~0.4 s of driver time per x29/x30 plan build
    (measured, r9), while the JSON decode runs only on the handful of
    per-group/per-column estimate rows."""
    lut = hll_lut_sql()
    s = f"CAST({sp} + ({HLL_M} - {nr}) * {_HLL_SCALE} AS DOUBLE)"
    v = f"CAST({HLL_M} - {nr} AS BIGINT)"
    raw = f"({HLL_EST_CONST!r}D / {s})"
    lin = f"element_at({lut}, CAST(greatest({v}, CAST(1 AS BIGINT)) AS INT))"
    return F.expr(
        f"CASE WHEN {raw} <= {2.5 * HLL_M!r}D AND {v} > 0 THEN {lin} ELSE {raw} END"
    )


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """(group, idx, m) register rows → (group, approx_distinct).
    Harmonic fold in exact int64, then the standard raw/linear-counting
    estimator with bit-stable float ops (module comment)."""
    agg = regs.groupBy("group").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m)")).alias("sp"),
        F.count(F.lit(1)).alias("nr"),
    )
    return agg.select(
        "group",
        _hll_estimate_expr("sp", "nr").alias("approx_distinct"),
    )


def portable_hll_registers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HLL register state (group, idx, m) from the portable
    60-bit hash: low HLL_P bits pick the register, the leading-zero
    rank of the remaining 48 bits is max-folded per register. ONE
    shuffle keyed (group, idx) with map-side MAX combine — per-group
    reducer state is register-bounded (≤ m rows), never
    cardinality-bounded; this is the whole scale story."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .select(
            "group",
            F.col("h").bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
            F.shiftright("h", HLL_P).alias("w"),
        )
        .select(
            "group",
            "idx",
            F.when(F.col("w") == 0, F.lit(_HLL_W + 1))
            .otherwise(F.lit(_HLL_W + 1) - F.length(F.bin("w")))
            .alias("rank"),
        )
        .groupBy("group", "idx")
        .agg(F.max("rank").alias("m"))
    )


def portable_hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Mergeable per-group distinct estimate + ``__total__`` union row,
    same contract as :func:`mergeable_distinct` but with portable
    (SQL-replayable) register state: the union is a register-wise MAX
    over the per-group states — O(m) per merge, no rescans — which is
    the same shard-then-merge shape as the DataSketches variant
    (agreement between the two is pinned in tests/test_sketches.py)."""
    regs = portable_hll_registers(df, group_col, value_col)
    total = (
        regs.groupBy("idx")
        .agg(F.max("m").alias("m"))
        .select(F.lit("__total__").alias("group"), "idx", "m")
    )
    return _hll_estimate(regs.unionByName(total))
