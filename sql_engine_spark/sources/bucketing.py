"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both
sides on the join key. Bucketing persists each table hash-partitioned
(and optionally sorted) by that key, so a later join/groupBy on the
same key reads co-located buckets and plans WITHOUT an Exchange on
either side — the shuffle is paid once at write time, then amortized
over every downstream query. This is Spark's equivalent of the
partition-aligned storage the OLAP literature calls co-partitioning;
the reference engine has no storage layout concept at all (whole-file
CSV slurp, reference sqlengine.py:104-117).

Verified by plan assertion in tests/test_plans.py
(test_bucketed_join_is_shuffle_free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed parquet table.

    ``n_buckets`` should match downstream parallelism (≈ shuffle
    partitions); both join sides must use the SAME bucket count and
    keys for the exchange to be elided.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on ``on``: plans with zero Exchange
    (bucket-aligned scan feeds SortMergeJoin directly)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
