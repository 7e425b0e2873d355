"""Local mirror of the driver's DuckDB-oracle comparison: run a matrix
entry on Spark and its oracle SQL on DuckDB over the same parquet, then
compare row count, schema (column names) and values (order-insensitive,
exact for non-floats, tiny-tolerance report for floats so we can see
whether exactness actually holds — the engine aims for bit-identical)."""

from __future__ import annotations

import math
import os

import duckdb

from sql_engine_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def compare(spark_df, oracle_pdf, float_exact: bool = True):
    """Returns (ok, message). Sorts columns by name and rows by value."""
    import pandas as pd  # noqa: F401

    spark_pdf = spark_df.toPandas()
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"rowcount mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    s_rows = sorted(tuple(_norm_cell(v) for v in row) for row in spark_pdf[s_cols].itertuples(index=False, name=None))
    o_rows = sorted(tuple(_norm_cell(v) for v in row) for row in oracle_pdf[o_cols].itertuples(index=False, name=None))
    if s_rows == o_rows:
        return True, "exact match"
    # Find first differing row for diagnostics; check float tolerance.
    n_diff = 0
    first = None
    approx_ok = True
    for a, b in zip(s_rows, o_rows):
        if a != b:
            n_diff += 1
            if first is None:
                first = (a, b)
            for ca, cb in zip(a, b):
                if ca == cb:
                    continue
                if ca[0] == "f" and cb[0] == "f":
                    fa, fb = float(ca[1]), float(cb[1])
                    if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                        approx_ok = False
                else:
                    approx_ok = False
    msg = f"{n_diff} differing rows; first diff: spark={first[0]} oracle={first[1]}; approx_ok={approx_ok}"
    if not float_exact and approx_ok:
        return True, "approx match: " + msg
    return False, msg
