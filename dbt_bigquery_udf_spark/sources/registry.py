"""Source registry — the engine's equivalent of dbt's ``source()``.

The reference declares one externally-managed table
(reference: models/udf/source.yml:4-9, ``joshua_dataset.test_table``) and
consumes it via ``{{ source('joshua_dataset', 'test_table') }}``
(reference: models/udf/table_function/test_table_function.sql:12).

Here a "source" is a parquet table under a scale-factor directory
(``/root/testdata/sf*/``), registered as a session temp view so it
resolves regardless of the current database (required because TVF calls
force a ``USE <db>``; see catalog.py). Temp-view registration is
zero-copy: the view is just a named logical plan over the parquet scan,
so Catalyst still sees the file relation and pushes filters/column
pruning into the scan.

Scale note: at 100 TB these would be external tables over partitioned
object-store prefixes; registration stays O(metadata). Nothing here
collects data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "SOURCE_TABLES",
    "register_sources",
    "register_sources_catalog",
    "read_source",
]

SOURCE_TABLES: tuple[str, ...] = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet carries a ``timestamp[ns]`` column (``ts``).

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as bigint
    nanoseconds; convert back to a civil timestamp (session TZ is UTC so
    the wall-clock value matches DuckDB's native nanosecond read,
    truncated to microseconds — Spark's timestamp precision).
    Falls back to a pyarrow cast if the conf could not be applied to a
    foreign session (small-table path only; the conf path is the scale path).
    """
    from pyspark.sql import functions as F

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            # expr() for integer DIV — '/' would go through double and lose
            # precision at epoch-nanos magnitude.
            df = df.withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
            )
        return df
    except Exception:
        # Foreign session that rejects nanos parquet: rewrite via Arrow.
        import pyarrow.dataset as ds

        table = ds.dataset(path).to_table()
        schema = table.schema
        idx = schema.get_field_index("ts")
        import pyarrow as pa

        table = table.set_column(
            idx, "ts", table.column("ts").cast(pa.timestamp("us"))
        )
        pdf = table.to_pandas()
        sdf = spark.createDataFrame(pdf)
        return sdf.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def read_source(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


# (session id, sf_dir, table) -> DataFrame. DataFrames are immutable
# plan handles, so reuse avoids re-reading parquet footers for schema
# inference on every query invocation (~1-2s per call across 10 tables).
_source_cache: dict[tuple[int, str, str], DataFrame] = {}


def register_sources(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = SOURCE_TABLES,
) -> dict[str, DataFrame]:
    """Register every source parquet as a temp view named after the table.

    Idempotent (``createOrReplaceTempView``) so driver re-entry at a
    different scale factor just repoints the views.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        key = (id(spark), sf_dir, name)
        df = _source_cache.get(key)
        if df is None:
            df = read_source(spark, sf_dir, name)
            _source_cache[key] = df
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def register_sources_catalog(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    database: str = "src",
    tables: tuple[str, ...] = SOURCE_TABLES,
) -> None:
    """Register sources as *persistent* external tables in ``database``.

    Persistent SQL functions (the engine's UDF/TVF materializations) may
    not reference temp views (probed on 4.1.2: INVALID_TEMP_OBJ_REFERENCE),
    so model-facing sources are external parquet tables — zero-copy DDL
    over the files, exactly how the reference treats its source as an
    externally-managed BigQuery table
    (reference: models/udf/source.yml:4-9).

    ``events`` needs a nanosecond conversion (see :func:`_read_events`),
    expressed as a persistent view over the raw external table so the
    transformation stays declarative and pushdown-friendly.

    Idempotent; re-registering against a different ``sf_dir`` repoints
    every table. Scale note: at 100 TB these CREATEs point at partitioned
    object-store prefixes — still O(metadata).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            spark.sql(f"DROP TABLE IF EXISTS {database}.events_raw")
            spark.sql(
                f"CREATE TABLE {database}.events_raw USING parquet LOCATION '{path}'"
            )
            raw_dtypes = dict(spark.table(f"{database}.events_raw").dtypes)
            ts_expr = (
                # integer DIV, not '/': double division loses precision at
                # epoch-nanos magnitude (~1.7e18 > 2^53).
                "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"
                if raw_dtypes.get("ts") in ("bigint", "long")
                else "CAST(ts AS TIMESTAMP_NTZ)"
            )
            spark.sql(
                f"CREATE OR REPLACE VIEW {database}.events AS "
                f"SELECT event_id, {ts_expr} AS ts, user_id, event_type, value, props "
                f"FROM {database}.events_raw"
            )
        else:
            spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
            spark.sql(
                f"CREATE TABLE {database}.{name} USING parquet LOCATION '{path}'"
            )
