"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["ensure_min_partitions", "local_rows_df", "local_empty_df"]


def _sql_literal(v, dtype: T.DataType) -> str:
    """Render a Python scalar/list as a Spark SQL literal of ``dtype``.

    Doubles use ``repr`` (shortest round-trip decimal — parses back to
    the identical IEEE double) with the ``D`` suffix; strings escape
    backslash and quote; arrays recurse element-wise.
    """
    if v is None:
        return f"CAST(NULL AS {dtype.simpleString()})"
    if isinstance(dtype, T.ArrayType):
        if len(v) == 0:
            return f"CAST(array() AS {dtype.simpleString()})"
        inner = ", ".join(_sql_literal(x, dtype.elementType) for x in v)
        return f"array({inner})"
    if isinstance(dtype, T.DoubleType):
        f = float(v)
        if f != f:  # NaN
            return "CAST('NaN' AS DOUBLE)"
        if f in (float("inf"), float("-inf")):
            return f"CAST('{f}' AS DOUBLE)"
        return f"{f!r}D"
    if isinstance(dtype, T.BooleanType):
        return "TRUE" if v else "FALSE"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return f"CAST({int(v)} AS {dtype.simpleString()})"
    if isinstance(dtype, T.StringType):
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    raise TypeError(f"local_rows_df: unsupported literal type {dtype}")


def local_rows_df(spark: SparkSession, rows, schema_ddl: str) -> DataFrame:
    """Drop-in for ``spark.createDataFrame(rows, schema_ddl)`` on small
    driver-built row lists, planned as a pure JVM ``VALUES`` local
    relation instead of a pickled Python RDD.

    ``createDataFrame(list_of_tuples)`` plans a Python-RDD scan, so
    EVERY downstream action pays a Python-worker round trip (measured
    ~0.3s per action on this host vs ~0.05s for the VALUES form, and
    0.50s vs 0.15s for a tiny ``saveAsTable``) — the guide-§4 "eliminate
    the Python boundary" rule applied to literal relations. Values are
    rendered as exact SQL literals (doubles via shortest-round-trip
    ``repr`` + ``D``, bit-identical), and the result is cast with
    ``DataFrame.to`` so the schema (incl. nullability) matches the
    ``createDataFrame`` original exactly. Intended for k-bounded
    relations (centroids, pointers, tombstone waves); plan size grows
    with ``rows``, so keep it to O(100s) of rows.
    """
    schema = (
        schema_ddl
        if isinstance(schema_ddl, T.StructType)
        else T._parse_datatype_string(schema_ddl)
    )
    rows = list(rows)
    if not rows:
        return local_empty_df(spark, schema)
    rendered = []
    try:
        for row in rows:
            if not isinstance(row, (tuple, list)):
                row = (row,)
            rendered.append(
                "("
                + ", ".join(
                    _sql_literal(v, f.dataType)
                    for v, f in zip(row, schema.fields)
                )
                + ")"
            )
    except TypeError:
        # type outside the literal renderer (timestamp, decimal, map,
        # struct): fall back to the classic path — correctness first,
        # the fast path covers the hot shapes
        return spark.createDataFrame(rows, schema)
    cols = ", ".join(f.name for f in schema.fields)
    df = spark.sql(f"SELECT * FROM VALUES {', '.join(rendered)} AS t({cols})")
    # union with the empty (all-nullable) relation: literals analyze as
    # non-nullable, but createDataFrame's DDL schema is nullable — the
    # union ORs nullability so the schema matches exactly (the optimizer
    # folds the empty side away; no runtime cost)
    return local_empty_df(spark, schema_ddl).union(df.to(schema))


def local_empty_df(spark: SparkSession, schema_ddl) -> DataFrame:
    """Empty DataFrame with ``schema_ddl`` (DDL string or StructType), as
    a JVM local relation (the ``createDataFrame([], ddl)`` shape without
    the Python-RDD scan)."""
    schema = (
        schema_ddl
        if isinstance(schema_ddl, T.StructType)
        else T._parse_datatype_string(schema_ddl)
    )
    sel = ", ".join(
        f"CAST(NULL AS {f.dataType.simpleString()}) AS {f.name}"
        for f in schema.fields
    )
    return spark.sql(f"SELECT {sel} WHERE 1=0").to(schema)


def ensure_min_partitions(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition a *compute-heavy* input up to the cluster's
    parallelism when the scan gives too few partitions.

    The test corpora are single parquet files -> one scan partition, so
    an expensive per-row stage (per-shingle hashing, Arrow decode)
    otherwise runs on one core. At production scale inputs span many
    file splits, `partitions >= cores` holds, and this is a no-op — so
    the extra shuffle of raw input exists only in the degenerate
    small-input case where it is cheap by construction.

    Only wrap inputs whose downstream per-row work dominates a shuffle
    of the input itself; plain scans/filters/aggregates never need it.
    """
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(cores * min_ratio)):
        return df.repartition(cores)
    return df
