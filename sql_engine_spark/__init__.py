"""sql_engine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query surface of the
reference engine ``nisacharan/sql_engine`` (a single-process Python SQL
subset interpreter; see SURVEY.md), extended with the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
streaming) and designed for 100 TB scale:

- All relational semantics are declared through the DataFrame / Spark SQL
  API so Catalyst performs predicate pushdown, column pruning, join
  selection and AQE re-planning (the reference performs none of these —
  it materializes a full cartesian product then filters,
  reference sqlengine.py:384-410).
- No ``collect()`` inside operator paths; driver-side data movement is
  restricted to broadcast-sized values (e.g. a single query vector).
- Python executes only inside Arrow-batched pandas UDFs / mapInPandas,
  never row-at-a-time.
"""

from sql_engine_spark.session import get_spark
from sql_engine_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"
