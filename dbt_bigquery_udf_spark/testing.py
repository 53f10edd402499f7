"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count, schema,
and an order-insensitive value hash. This module lets the test suite (and
the development loop) run the same comparison before the driver does.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
from pyspark.sql import SparkSession

__all__ = ["duckdb_connection", "compare_query"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(
    spark: SparkSession,
    query_fn,
    oracle: str | None,
    sf_dir: str,
    name: str = "?",
) -> dict:
    """Run Spark query + DuckDB oracle, compare; returns a result dict."""
    sdf = query_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    result: dict[str, Any] = {"name": name, "spark_rows": len(srows), "cols": scols}
    if oracle is None:
        result["status"] = "rows_only"
        result["ok"] = len(srows) >= 0
        return result
    con = duckdb_connection(sf_dir)
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    result["oracle_rows"] = len(orows)
    if sorted(scols) != sorted(ocols):
        result.update(status="schema_mismatch", ok=False, oracle_cols=ocols)
        return result
    a, b = _norm_rows(scols, srows), _norm_rows(ocols, orows)
    if len(a) != len(b):
        result.update(status="rowcount_mismatch", ok=False)
        return result
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    if mismatches:
        result.update(
            status="value_mismatch", ok=False, n_mismatch=len(mismatches),
            first=mismatches[0],
        )
        return result
    result.update(status="match", ok=True)
    return result
