from sql_engine_spark.sql.dialect import normalize_query
from sql_engine_spark.sql.frontend import run_sql

__all__ = ["normalize_query", "run_sql"]
