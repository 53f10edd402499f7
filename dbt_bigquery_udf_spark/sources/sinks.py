"""Sink-side writers: how engine outputs land on storage at scale.

The reference's only sink is the warehouse table its datamart model
creates (CTAS — `models/core.py` F15). At 100 TB the write layout *is*
the read plan of every downstream query, so the engine exposes the two
layouts that matter and the knobs that keep files healthy:

- ``write_partitioned``: hive-style directory partitioning on a
  low-cardinality key (date, language, source). Downstream filters on
  the key become partition pruning — no file even opens.
- ``write_bucketed``: hash-bucketed + sorted table on a join/group key.
  Equal-bucketed joins co-locate without a shuffle (the bucketing
  metadata lives in the catalog, so this writes a managed table).

Both repartition by the layout key before writing so each task owns
whole output files (no small-file explosion: one file per partition
value per shuffle partition, not per input task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_partitioned", "write_bucketed"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by``.

    Repartitioning on the partition columns first means each output
    directory is written by one task — without it, every shuffle
    partition emits a file into every directory (tasks × values files).
    ``maxRecordsPerFile`` caps file size so one hot partition value
    still splits into scannable files.
    """
    writer = (
        df.repartition(*partition_by)
        .write.mode(mode)
        .partitionBy(*partition_by)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on their join key join without a
    shuffle; sorted buckets additionally skip the sort of a sort-merge
    join. This is the deploy-time fix for the fact-to-fact shuffles
    documented in SCALE.md (orders ⋈ lineitem on orderkey).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
