"""Rewrite-and-swap: atomically replace a managed parquet table.

Plain parquet tables cannot be MERGEd or overwritten by a query that
reads them (Spark refuses the cyclic scan), so every in-place update in
this engine — snapshots (SCD2), the `merge` incremental strategy —
funnels through the same dance: write the next state to a staging
table, drop the target, rename staging over it. The rename is a
metadata move for managed tables, so the swap itself is O(1); the cost
is writing the next state, which each caller bounds (snapshots by
partition-stable keys, merge by partition-scoped rewrites).

Delta/Iceberg MERGE is the drop-in upgrade and would replace only this
module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["swap_table", "rm_default_location", "table_location", "rm_path"]


def swap_table(spark: SparkSession, target: str, next_state: DataFrame) -> None:
    """Replace ``target`` (an existing managed table) with the rows of
    ``next_state``, which may itself read from ``target``."""
    staging = f"{target}__swap_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    rm_default_location(spark, staging)  # stale dir from a crashed run
    next_state.write.format("parquet").saveAsTable(staging)
    location = table_location(spark, target)
    spark.sql(f"DROP TABLE {target}")
    # DROP can leave the managed directory behind (observed on the
    # local filesystem); the rename refuses to adopt an existing
    # location, so clear it explicitly.
    rm_path(location)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")
    # The rename keeps the table name but swaps its files; drop the
    # cached file listing or the next read resolves deleted parts.
    spark.sql(f"REFRESH TABLE {target}")


def table_location(spark: SparkSession, table: str) -> str | None:
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row[0] == "Location":
            return row[1]
    return None


def rm_path(location: str | None) -> None:
    import shutil
    from urllib.parse import urlparse

    if not location:
        return
    path = urlparse(location).path
    if path and os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def rm_default_location(spark: SparkSession, table: str) -> None:
    """Remove the default managed location ``<warehouse>/<db>.db/<name>``
    for a table that does not exist in the (fresh) metastore."""
    from urllib.parse import urlparse

    db, _, name = table.partition(".")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        rm_path("file:" + os.path.join(warehouse, f"{db.lower()}.db", name.lower()))
