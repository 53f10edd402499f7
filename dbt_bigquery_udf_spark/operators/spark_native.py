"""Spark-native scale primitives the reference's warehouse (BigQuery)
provides as built-ins: bitmap-based exact distinct counting and VARIANT
semi-structured access. Engine extensions (SURVEY.md §2.3 — the
reference itself has no aggregates), registered with exact DuckDB
oracles like every other operator.

Why these two matter at 100 TB:

- **Bitmap distinct** (`bitmap_construct_agg` family, Spark 3.5+) makes
  exact COUNT(DISTINCT) *mergeable*: per-(group, bucket) bitmaps are a
  materializable rollup that re-aggregates to any coarser grain with
  `bitmap_or_agg` — no rescan of the fact table, unlike plain
  count(DISTINCT) whose partial state is the value set itself. This is
  BigQuery's HLL++-sketch pattern but exact. One pitfall, handled here:
  bit positions are 1-based (value 0 maps to bit -1 of bucket 0 and is
  silently dropped), so values are offset by +1 before bucketing.
- **VARIANT** (`parse_json`/`variant_get`, Spark 4.0+) stores JSON as a
  typed binary encoding: paths are navigated without re-parsing text
  per access, and no upfront schema is required (vs `from_json`, which
  needs one — see mm_props_extract for that pattern). BigQuery's JSON
  type has the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from .util import local_empty_df
from .analytics import _src


@register(
    "distinct_bitmap_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def distinct_bitmap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via two-level bitmap
    aggregation: (type, day, bucket) bitmaps first — the mergeable
    rollup a real pipeline would materialize — then OR-merged across
    days and counted, summing across buckets.

    The oracle states the same number as a plain count(DISTINCT): the
    bitmap path must agree exactly (it is exact, not a sketch).

    Scale: the day-level rollup is the artifact. A 100 TB events table
    aggregates once to |types x days x buckets| fixed-width (4 KB
    bitmap) rows; every coarser re-aggregation (weekly, monthly,
    all-time, per-type) is bitmap_or_agg over THAT, never a rescan.
    Plain count(DISTINCT) shuffles the full value set per regrouping.
    user_id+1: bitmap positions are 1-based (see module docstring).
    """
    ev = _src(spark, sf_dir)["events"]
    level1 = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id + 1)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id + 1)").alias("pos"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    merged = level1.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("bucket_users")
    )
    return merged.groupBy("event_type").agg(
        F.sum("bucket_users").alias("n_users")
    )


@register(
    "events_variant_extract",
    """
    SELECT event_type,
           count(*) AS n,
           -- outer CAST: DuckDB sum(BIGINT) -> HUGEINT -> pandas float64
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
           count(CAST(json_extract(props, '$.missing') AS BIGINT)) AS n_missing_hits
    FROM events GROUP BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless JSON access via VARIANT: parse ``props`` once into the
    binary VARIANT encoding, extract typed paths with ``variant_get``
    (and ``try_variant_get`` for absent paths — NULL, counted as 0
    hits, never an error).

    vs ``from_json`` (mm_props_extract): no upfront schema; unknown /
    evolving keys cost nothing until accessed. At 100 TB the parse
    happens once per row inside codegen and each path access walks the
    binary encoding — no repeated text parsing, which is exactly the
    reason BigQuery's JSON type (and Spark's VARIANT) exists.
    """
    ev = _src(spark, sf_dir)["events"]
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    missing = F.expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.count("m").alias("n_missing_hits"),
        )
    )


@register(
    "global_row_ids",
    """
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS global_id
    FROM documents
    """,
)
def global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global ordinals 1..N in key order WITHOUT a global
    sort — the DataFrame equivalent of RDD ``zipWithIndex`` (which the
    DataFrame API lacks; ``monotonically_increasing_id`` is neither
    contiguous nor order-correct, and ``row_number() OVER (ORDER BY
    ...)`` collapses 100 TB onto one task).

    Two-pass histogram scheme, fully deterministic (no sampling):
      1. one aggregate finds min/max, rows land in k fixed value-range
         buckets; per-bucket counts (k tiny rows) come back to the
         driver and prefix-sum into per-bucket starting offsets;
      2. rows are hash-partitioned by bucket, sorted (bucket, key)
         within partitions, and a mapInPandas pass assigns
         offset[bucket] + running-count-in-bucket.

    Scale: the only collected state is k counts; the only shuffle is
    one hash repartition by bucket; the sort is partition-local. Bucket
    skew affects balance, never correctness. k is SIZE-DERIVED (round-3
    fix of the fixed-k nit): the same aggregate that finds min/max also
    counts rows, and k grows so each bucket's partition-local sort stays
    bounded (~32M keys, a few hundred MB) — at 100 TB / ~10^12 keys
    that is ~32k buckets of driver state (one int64 count each), still
    trivially collectable. The output is k-invariant, so deriving k is
    a pure plan change. This is the standard pattern for assigning
    stable training-example ids / shard ordinals to a 100 TB corpus.
    """
    docs = _src(spark, sf_dir)["documents"].select("doc_id")
    return _number_by_key(docs, "doc_id")


# Per-bucket sort budget: keys are fixed-width (int64 + bucket int), so
# 32M rows/bucket is a few hundred MB of partition-local sort — well
# inside executor memory at any SF; the floor keeps fixture-scale runs
# at the write parallelism tests pin.
_ROWS_PER_BUCKET = 32_000_000
_BUCKET_FLOOR = 8
_BUCKET_CAP = 1 << 20  # 1M buckets = 8 MB of driver counts; never binds


def _derive_bucket_count(
    n_rows: int,
    rows_per_bucket: int = _ROWS_PER_BUCKET,
    floor: int = _BUCKET_FLOOR,
) -> int:
    """Bucket count for ``n_rows`` keys: enough buckets that each
    partition-local sort handles <= rows_per_bucket keys, floored for
    fixture-scale parallelism, capped to bound driver state."""
    need = -(-max(0, int(n_rows)) // max(1, int(rows_per_bucket)))
    return max(floor, min(_BUCKET_CAP, need))


def _number_by_key(
    df: DataFrame,
    key: str,
    k: int | None = None,
    rows_per_bucket: int = _ROWS_PER_BUCKET,
) -> DataFrame:
    """The two-pass histogram numbering behind :func:`global_row_ids`,
    reusable on any DataFrame with a unique integer ``key`` column.
    Returns ``(key, global_id)`` with global_id = 1..N in key order.
    ``k`` buckets bound the driver state and set write parallelism;
    None (the default) derives k from the input's row count so the
    per-bucket sort memory stays bounded at any scale."""
    spark = df.sparkSession
    lo, hi, n_rows = df.agg(F.min(key), F.max(key), F.count(F.lit(1))).first()
    if lo is None:  # empty input: empty output, same schema
        return local_empty_df(spark, f"{key} bigint, global_id bigint")
    if k is None:
        k = _derive_bucket_count(n_rows, rows_per_bucket)
    # Bucket in DOUBLE space: (key - lo) * k would overflow int64 when
    # keys span most of the long range (hash-derived ids). The double
    # mapping is monotone non-decreasing in key and identical in both
    # passes, which is all bucketing needs — boundary rounding only
    # shifts which bucket a boundary key lands in, never its order.
    span = float(int(hi) - int(lo) + 1)
    bucket = (
        F.greatest(
            F.least(
                F.floor(
                    (F.col(key).cast("double") - F.lit(float(lo))) * k / F.lit(span)
                ),
                F.lit(k - 1),
            ),
            F.lit(0),
        )
    ).cast("int")
    withb = df.select(key).withColumn("_b", bucket)
    counts = {
        r["_b"]: r["cnt"]
        for r in withb.groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    def assign(batches):
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            within = pdf.groupby("_b").cumcount()
            base = pdf["_b"].map(
                lambda b: offsets[int(b)] + seen.get(int(b), 0)
            )
            pdf["global_id"] = base + within + 1
            for b, n in pdf["_b"].value_counts().items():
                seen[int(b)] = seen.get(int(b), 0) + int(n)
            yield pdf[[pdf.columns[0], "global_id"]]

    return (
        withb.repartition(k, "_b")
        .sortWithinPartitions("_b", key)
        .mapInPandas(assign, f"{key} bigint, global_id bigint")
    )
