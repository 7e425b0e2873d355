"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``sql_engine_spark/``; the query matrix
(Spark callables + oracle SQL, one entry per implemented operator from
SURVEY.md §2) is registered in ``sql_engine_spark/matrix/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_engine_spark import matrix  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style revenue
    by nation (6-table join → broadcast dims → grouped exact-cents
    aggregation). Exercises scan, filter pushdown, equi-join, broadcast,
    and grouped aggregation in one plan (SURVEY.md §7 phase 1)."""
    return matrix.QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(matrix.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible entry.
    Entries absent here (MinHash/SimHash/ANN/stateful-streaming) are
    approximate or micro-batch-dependent ops → rows-only check."""
    return dict(matrix.ORACLE)
