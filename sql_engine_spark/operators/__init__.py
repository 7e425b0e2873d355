from sql_engine_spark.operators import dedup, relational, similarity, text

__all__ = ["relational", "dedup", "similarity", "text"]
