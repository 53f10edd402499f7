"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_partitions"]


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
