"""SQL front door: the engine's equivalent of the reference's
``python sqlengine.py "SELECT ..."`` entry (reference sqlengine.py:9-16,
20172086.sh:1). Normalize the dialect, then hand the full query to
Spark's parser → analyzer → Catalyst → Tungsten; there is no custom
parse/execute path to maintain (SURVEY.md §3.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.sql.dialect import normalize_query, rewrite_bind_markers


def run_sql(
    spark: SparkSession,
    query: str,
    args: dict[str, object] | list[object] | None = None,
) -> DataFrame:
    """Run one (dialect-normalized) SQL query.

    ``args`` are bind parameters covering ALL the reference grammar's
    marker forms (parser.py:54-57, though the reference never executes
    them): a dict binds ``:name``/``@name``/``$name`` markers, a list
    binds positional ``?`` and numbered ``?NNN`` markers (SQLite
    numbering: ``?3`` takes the third list element; a bare ``?`` takes
    the next index). The shim rewrites the marker spellings Spark lacks
    to named markers; binding itself is Spark's parameterized
    ``spark.sql`` (literals injected post-parse, so no
    quoting/injection concerns)."""
    q = normalize_query(query)
    q, numbered = rewrite_bind_markers(q)
    if args is None:
        return spark.sql(q)
    if numbered and isinstance(args, (list, tuple)):
        args = {f"__p{i + 1}": v for i, v in enumerate(args)}
    return spark.sql(q, args=args)
