"""Table catalog: parquet corpus loader + temp-view registration.

Replaces the reference's global in-memory catalog (``definedb`` parsing
``metadata.txt`` into name→ordinal dicts, reference sqlengine.py:72-90,
and ``populatedb`` slurping whole CSVs into row lists, sqlengine.py:104-117).
Spark's catalog + analyzer take over name resolution; DataFrames stay
lazy/columnar instead of materialized Python lists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.session import rightsize_shuffle_partitions

# The driver-generated synthetic corpus (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table.

    Columnar source + Catalyst means column pruning and predicate
    pushdown reach the scan for free (verify with
    ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``) —
    the opposite of the reference, which loads every column of every row
    before any filtering (sqlengine.py:104-117).
    """
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
        # reader rejects outright unless nanos surface as long. A
        # caller-provided session (the driver's) may lack the conf, and
        # it's a runtime SQL conf, so set it here before schema read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ→LTZ cast in _normalize_nanos_ts (and every downstream
        # to_date/window) reads the session time zone; a caller-provided
        # non-UTC session would shift instants away from the UTC-reading
        # DuckDB oracle. Runtime SQL conf — pin it with the same
        # only-for-callers-sessions rationale as nanosAsLong.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    rightsize_shuffle_partitions(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos_ts(df)


def _normalize_nanos_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (LTZ) whatever
    the corpus stored:

    - parquet TIMESTAMP(NANOS): with ``nanosAsLong`` it surfaces as
      long nanos → convert via integer division (``div`` — exact on
      int64; a double division would lose precision above 2^53), the
      same floor-to-µs DuckDB applies.
    - parquet TIMESTAMP(MICROS, no tz): surfaces as TIMESTAMP_NTZ →
      cast to TIMESTAMP. The session time zone is pinned to UTC
      (session.py), so the wall-clock is reinterpreted as the same
      instant DuckDB reads — and downstream instant functions
      (unix_millis, window, watermarks) type-check."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` resolves the
    same names the DuckDB oracle uses (replaces the reference's
    ``dbFramework`` ordinal maps, sqlengine.py:20-23,84-90)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
