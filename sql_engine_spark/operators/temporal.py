"""Tier X temporal join operators: as-of join and range join.

Spark has no native ASOF or band-join operator (the reference has no
join algorithms at all beyond the nested-loop product, reference
sqlengine.py:120-135); a naive inequality join plans as a
BroadcastNestedLoopJoin — O(n·m) and a 100 TB non-starter. Both
operators here re-express the semantics with equi-join/window shapes
Catalyst executes with hash shuffles:

- as-of join: union both sides tagged, one window pass per key carries
  the most recent right-side row forward (the "union + last_value"
  pattern; one shuffle on the key, state O(1) per row).
- range join: quantize time to buckets of the band width, equi-join on
  (key, bucket) with each probe row expanded to the 3 adjacent buckets,
  then an exact band filter. Every qualifying pair is found exactly
  once (its bucket distance is ≤ 1 by construction) — result is
  identical to the naive inequality join, but the shuffle key is
  (key, bucket) so work scales with matches, not with n·m.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` for the same ``key`` (backward as-of, ties
    included — same-ts right rows match). NULLs when no prior right row
    (or none within ``tolerance_ms``).

    Output: all left columns + ``asof_ts`` + ``asof_<col>`` for each
    requested right value column.
    """
    lt = left.withColumn("__side", F.lit(1))
    payload = F.struct(F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_value_cols])
    rt = right.select(
        key, ts_col, F.lit(0).alias("__side"), payload.alias("__rpayload")
    )
    l_cols = [c for c in left.columns]
    lt = lt.select(*l_cols, "__side", F.lit(None).cast(rt.schema["__rpayload"].dataType).alias("__rpayload"))
    unioned = lt.unionByName(rt.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != key and c != ts_col else F.col(c) for c in l_cols], "__side", "__rpayload"))
    # Right rows sort before left rows at equal ts → same-ts rights match.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last_r", F.last("__rpayload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    asof_ts = F.col("__last_r.__rts")
    if tolerance_ms is not None:
        in_band = (F.unix_millis(F.col(ts_col)) - F.unix_millis(asof_ts)) <= tolerance_ms
        out = out.withColumn("__last_r", F.when(in_band, F.col("__last_r")))
        asof_ts = F.col("__last_r.__rts")
    return out.select(
        *l_cols,
        asof_ts.alias("asof_ts"),
        *[F.col(f"__last_r.{c}").alias(f"asof_{c}") for c in right_value_cols],
    )


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    band_ms: int = 600_000,
) -> DataFrame:
    """All pairs of rows with the same ``key`` whose timestamps differ
    by at most ``band_ms`` (id_a < id_b). Bucket-quantized equi-join:
    identical result to the O(n²) inequality join, hash-shuffle cost.

    Output: (key, id_a, id_b, dt_ms ≥ −band..band as a_ts − b_ts)."""
    ms = F.unix_millis(F.col(ts_col))
    bucket = F.floor(ms / F.lit(band_ms)).cast("long")
    a = df.select(F.col(key), F.col(id_col).alias("id_a"), ms.alias("ms_a"), bucket.alias("__b"))
    b = df.select(
        F.col(key).alias("__k2"),
        F.col(id_col).alias("id_b"),
        ms.alias("ms_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("__b2"),
    )
    joined = a.join(
        b,
        (F.col(key) == F.col("__k2"))
        & (F.col("__b") == F.col("__b2"))
        & (F.col("id_a") < F.col("id_b")),
    )
    dt = F.col("ms_a") - F.col("ms_b")
    return (
        joined.filter(F.abs(dt) <= band_ms)
        .select(F.col(key), "id_a", "id_b", dt.alias("dt_ms"))
    )


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Strict sequential funnel: per user, walk events in (ts, id)
    order and advance one stage each time the NEXT expected step type
    appears (a later 'view' cannot satisfy stage 0 twice; order is
    what distinguishes a funnel from three EXISTS filters). Report how
    many users topped out at each stage 0..len(steps).

    Plan: ONE shuffle (the per-user collect_list), then the walk is a
    sorted-array left-to-right ``F.aggregate`` fold — a scan-stage
    expression, no window cascade, no per-step self-joins (the classic
    k-way funnel join would be k shuffles and explode on power users).
    Skew honesty: AQE does NOT split skewed aggregation partitions
    (its skew mitigation applies to join sides only), so one user's
    whole event list materializes in one task — the real bound is the
    per-user event count, which product telemetry keeps at 10³–10⁵
    (vs 10⁹+ rows/key where skew handling matters). For bot-scale
    users, the walk composes as a monoid — each locally-sorted event
    run reduces to a (k+1)-entry stage-transition map and maps
    compose associatively — at the price of a custom ordered-partial
    aggregate; the collect_list shape is the oracle-checkable default.
    The deterministic (ts, id) sort makes the result engine-exact, so
    this carries a full DuckDB oracle despite being an ordered-walk
    computation.

    Output: (stage, n_users), stage = furthest step index reached.
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"), F.col(type_col).alias("t")).alias("e"),
    )
    walk = F.aggregate(
        F.array_sort(F.collect_list("e")),
        F.lit(0),
        lambda acc, e: reduce_stage(acc, e["t"], steps),
    )
    per_user = ev.groupBy("u").agg(walk.alias("stage"))
    return (
        per_user.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("stage").cast("long").alias("stage"), "n_users")
    )


def reduce_stage(acc: Column, t: Column, steps: tuple[str, ...]) -> Column:
    """One funnel-walk step: advance acc when ``t`` is the next
    expected type. Exposed so the fold lambda stays readable."""
    out = None
    for i, s in enumerate(steps):
        cond = (acc == i) & (t == s)
        out = F.when(cond, F.lit(i + 1)) if out is None else out.when(cond, F.lit(i + 1))
    return out.otherwise(acc)


def retention_cohorts(
    events: DataFrame,
    epoch: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: cohort = the integer week
    (FLOOR(days since ``epoch`` / 7) — floor, not truncation, so
    pre-epoch events land in the right negative week; engine-neutral
    arithmetic, no date_trunc semantics to disagree on) of each
    user's FIRST event; report distinct active users per
    (cohort_week, week_offset).

    Two map-side-combinable aggregations (per-user first week, then
    the cohort grid) — the corpus shuffles narrow (user, week) pairs
    only. Output: (cohort_week, week_offset, n_users).
    """
    wk = F.floor(
        F.datediff(F.to_date(ts_col), F.lit(epoch).cast("date")) / 7
    ).cast("int")
    uw = events.select(F.col(user_col).alias("u"), wk.alias("w")).distinct()
    first = uw.groupBy("u").agg(F.min("w").alias("w0"))
    return (
        uw.join(first, "u")
        .groupBy(F.col("w0").alias("cohort_week"), (F.col("w") - F.col("w0")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_users",
        )
    )


def event_rate_anomalies(
    events: DataFrame,
    z_threshold: float = 2.0,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-rate anomaly score: how many standard deviations
    each user's event count sits from the population mean — the
    bot/abuse screen an event pipeline runs before sessionization.

    Exactness discipline: per-user counts n, the population size U,
    Σn and Σn² are all int64 (order-independent under parallel partial
    aggregation), and the z-score is computed WITHOUT forming the mean
    — ``z = (n·U − Σn) / sqrt(U·Σn² − (Σn)²)`` (algebraically exactly
    (n − μ)/σ_population). The products are taken AFTER casting each
    exact-int64 factor to double, in a pinned order — every factor is
    < 2⁵³ so the casts are exact and each IEEE multiply rounds
    identically on both engines — which also removes the ANSI-mode
    int64-overflow cliff a 10⁸-user corpus would hit if U·Σn² were
    formed in integers. The population moments fold in as a broadcast
    1-row cross join — never a driver collect.

    Output: (user_id, n_events, z, is_anomaly 0/1), all users.
    """
    per = events.groupBy(F.col(user_col)).agg(F.count(F.lit(1)).alias("n_events"))
    mom = per.agg(
        F.count(F.lit(1)).alias("U"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    ud, s1d, s2d = (F.col(c).cast("double") for c in ("U", "s1", "s2"))
    num = F.col("n_events").cast("double") * ud - s1d
    den = F.sqrt(ud * s2d - s1d * s1d)
    z = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return (
        per.crossJoin(F.broadcast(mom))
        .withColumn("z", z)
        .select(
            user_col,
            "n_events",
            "z",
            (F.abs(F.col("z")) > F.lit(z_threshold)).cast("long").alias("is_anomaly"),
        )
    )
