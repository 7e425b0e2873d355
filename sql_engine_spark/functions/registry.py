"""SQL-callable function registry.

The reference grammar accepts generic scalar calls ``f(args...)``
(reference parser.py:63) but ships no function registration surface at
all (SURVEY.md §2.2 "Not present anywhere": UDF/UDAF registration).
This module is that surface for the SQL front door: ``register_all``
makes the engine's extension functions callable from ``spark.sql`` /
``run_sql`` strings.

Performance contract: everything here is an Arrow-batched pandas UDF
(vectorized numpy per batch — never row-at-a-time Python), and each has
a pure-expression twin that is strictly faster because it stays inside
whole-stage codegen: ``functions/vector.py`` for dot/cosine,
``operators/dedup.shingle_hashes`` + ``array_intersect`` for Jaccard.
Operator hot paths use the expression twins; the registry exists so ad
hoc SQL can reach the same semantics by name.

UDF wrapping happens inside :func:`register_all`, not at import time —
``pandas_udf`` resolves its return type against the active session, so
decorating at module scope would make importing this module require a
running SparkContext.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession


def _dot_product(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if (u is None or v is None)
            else float(np.dot(np.asarray(u, dtype=np.float64), np.asarray(v, dtype=np.float64)))
            for u, v in zip(a, b)
        ],
        dtype="float64",
    )


def _cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for u, v in zip(a, b):
        if u is None or v is None:
            out.append(None)
            continue
        x = np.asarray(u, dtype=np.float64)
        y = np.asarray(v, dtype=np.float64)
        denom = float(np.linalg.norm(x) * np.linalg.norm(y))
        out.append(float(np.dot(x, y)) / denom if denom != 0.0 else None)
    return pd.Series(out, dtype="float64")


def _ngram_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
    """Word-trigram Jaccard of two texts (the x02 similarity measure as
    a scalar: set semantics over 3-gram shingles)."""

    def sh(t: str) -> set[str]:
        w = [x for x in t.split(" ") if x]
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    out = []
    for s, t in zip(a, b):
        if s is None or t is None:
            out.append(None)
            continue
        sa, sb = sh(s), sh(t)
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else None)
    return pd.Series(out, dtype="float64")


REGISTRY = {
    "dot_product": _dot_product,
    "cosine_sim": _cosine_sim,
    "ngram_jaccard": _ngram_jaccard,
}


def register_all(spark: SparkSession) -> list[str]:
    """Register every extension function for SQL use; returns the
    registered names. Safe to call repeatedly (re-registration
    overwrites)."""
    from pyspark.sql.functions import pandas_udf

    for name, fn in REGISTRY.items():
        spark.udf.register(name, pandas_udf(fn, "double"))
    return sorted(REGISTRY)
