"""The engine's query registry — the driver contract surface.

Each entry pairs a Spark query (``(spark, sf_dir) -> DataFrame``) with an
ANSI-SQL oracle DuckDB runs over the same parquet tables. Column names and
value normalization are aligned between the two (see ``testing.py``).

Organized by SURVEY.md §2 coverage: reference-parity queries first (the
UDF/TVF/datamart DAG), then the driver-mandated extension operators
(dedup, similarity, text analysis) contributed by ``operators/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .api import prepared_engine

__all__ = ["QUERIES", "ORACLES", "register"]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Reference parity (SURVEY.md §2.1/§2.2) — the UDF -> TVF -> datamart DAG.
# --------------------------------------------------------------------------

# DuckDB equivalent of the test_table stand-in view
# (models/reference.py TEST_TABLE_SQL) and of the parse_datetime fallback
# chain (reference: models/udf/function/parse_datetime.sql:9-16). The
# %E*S SAFE branch maps to a two-pattern try ladder in DuckDB because its
# %f requires the literal dot.
_ORACLE_PRELUDE = """
WITH test_table AS (
  SELECT event_type AS id,
         CAST(event_id AS VARCHAR) AS column1,
         CASE CAST(event_id % 5 AS INT)
           WHEN 0 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
           WHEN 1 THEN strftime(ts, '%Y/%m/%d')
           WHEN 2 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
           WHEN 3 THEN strftime(ts, '%Y-%m-%d')
           ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ')
         END AS column2
  FROM events
), parsed AS (
  SELECT id,
         CAST(column1 AS BIGINT) AS column1,
         coalesce(
           try_strptime(column2, '%Y/%m/%d %H:%M:%S'),
           try_strptime(column2, '%Y/%m/%d'),
           try_strptime(column2, '%Y-%m-%d %H:%M:%S'),
           try_strptime(column2, '%Y-%m-%d'),
           try_strptime(column2, '%Y-%m-%dT%H:%M:%S.%fZ'),
           try_strptime(column2, '%Y-%m-%dT%H:%M:%SZ'),
           strptime(column2, '%Y/%m/%d %H:%M:%S')
         ) AS datetime
  FROM test_table
)
"""


@register(
    "ref_datamart_e2e",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed WHERE id = 'click'",
)
def ref_datamart_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference DAG: source -> scalar UDF -> TVF -> datamart table
    (reference: models/datamart/test_datamart.sql:1-5); returns the
    materialized table."""
    prepared_engine(spark, sf_dir)
    return spark.table("datamart.test_datamart")


@register(
    "ref_parse_datetime",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed",
)
def ref_parse_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF applied over every row/format variant
    (reference: models/udf/function/parse_datetime.sql)."""
    prepared_engine(spark, sf_dir)
    return spark.sql(
        "SELECT CAST(column1 AS BIGINT) AS column1, "
        "udf.parse_datetime(column2) AS datetime FROM src.test_table"
    )


@register(
    "ref_tvf_param",
    _ORACLE_PRELUDE
    + "SELECT column1, datetime FROM parsed WHERE id = 'view'",
)
def ref_tvf_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized table-function invocation with a different argument
    than the datamart's (reference:
    models/udf/table_function/test_table_function.sql)."""
    prepared_engine(spark, sf_dir)
    from .catalog import catalog_lock

    with catalog_lock:
        prev = spark.catalog.currentDatabase()
        spark.sql("USE udf")
        try:
            # Analysis happens eagerly in spark.sql(), so the plan is
            # resolved while udf is the current database; later execution
            # does not re-resolve.
            return spark.sql(
                "SELECT column1, datetime FROM test_table_function('view')"
            )
        finally:
            spark.sql(f"USE {prev}")


# Extension operators register themselves on import (must come after
# ``register`` is defined — the circular import is intentional and safe).
from . import operators  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from .sources import format_queries  # noqa: E402,F401
