from sql_engine_spark.functions.money import cents, cents_sum_as_double, from_cents
from sql_engine_spark.functions.vector import cosine_similarity, dot, l2_norm, to_double_array

__all__ = [
    "cents",
    "from_cents",
    "cents_sum_as_double",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
