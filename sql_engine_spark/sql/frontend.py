"""SQL front door: the engine's equivalent of the reference's
``python sqlengine.py "SELECT ..."`` entry (reference sqlengine.py:9-16,
20172086.sh:1). Normalize the dialect, then hand the full query to
Spark's parser → analyzer → Catalyst → Tungsten; there is no custom
parse/execute path to maintain (SURVEY.md §3.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.sql.dialect import normalize_query


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(normalize_query(query))
