"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The implementation lives in :mod:`dbt_bigquery_udf_spark`; this module is
a thin shim over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_bigquery_udf_spark import queries as _q  # noqa: E402
from dbt_bigquery_udf_spark.api import prepared_engine  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the reference's full model DAG (external
    source -> parse_datetime UDF -> test_table_function TVF -> datamart
    table) at sf0.001 and return the materialized datamart."""
    prepared_engine(spark, "/root/testdata/sf0.001")
    return spark.table("datamart.test_datamart")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # curated_queries puts one representative of every operator family
    # inside the driver's first-50 checked window (see queries.py).
    return _q.curated_queries()


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
