"""Generic readers: one entry point per format the engine ingests.

The reference reads exactly one format — headerless CSV bound to a
``metadata.txt`` catalog (reference sqlengine.py:104-117; handled by
sources/csv_catalog.py). The engine generalizes to Spark's native
columnar + text sources, always schema-explicit: schema inference is a
full extra pass over the data (fatal at 100 TB) and can drift between
runs, so every reader takes a StructType or DDL string. Parquet/ORC
embed their schema; the ``schema`` argument there is a projection/
validation contract rather than inference avoidance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Line-delimited JSON with explicit schema: malformed lines go to
    the PERMISSIVE default (nulls), keeping a 100 TB ingest running;
    switch to FAILFAST in validation jobs."""
    return spark.read.schema(schema).json(path)
