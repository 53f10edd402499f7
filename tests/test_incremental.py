"""Incremental materialization (dbt's 4th core materialization)."""

from __future__ import annotations

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.models.core import ModelSpec


def _register_and_build(engine, spec):
    engine.register(spec, replace=True)
    return engine.build(select=[spec.name])


def test_incremental_append_watermark(spark, sf_small):
    """Classic watermark pattern: first run full-loads, second run
    inserts only rows newer than max(ts) in the target — here the
    source is static, so run 2 must insert nothing."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="events_incr",
        kind="incremental",
        database="datamart",
        dialect="spark",
        sql="""
SELECT event_id, ts, user_id, event_type, value
FROM {{ source('joshua_dataset', 'events') }}
{% if is_incremental() %}
WHERE ts > (SELECT max(ts) FROM {{ this }})
{% endif %}
""",
    )
    _register_and_build(engine, spec)
    n_full = spark.table("datamart.events_incr").count()
    n_src = spark.table("src.events").count()
    assert n_full == n_src

    # Second run: static source -> no rows newer than the watermark.
    _register_and_build(engine, spec)
    assert spark.table("datamart.events_incr").count() == n_full


def test_incremental_append_unique_key(spark, sf_small):
    """append + unique_key: re-running the same body must not
    duplicate rows (new-keys-only insert via anti join)."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="users_incr",
        kind="incremental",
        database="datamart",
        dialect="spark",
        unique_key="user_id",
        sql="""
SELECT user_id, count(*) AS n
FROM {{ source('joshua_dataset', 'events') }} GROUP BY user_id
""",
    )
    _register_and_build(engine, spec)
    n1 = spark.table("datamart.users_incr").count()
    _register_and_build(engine, spec)  # same body: all keys already present
    assert spark.table("datamart.users_incr").count() == n1


def test_incremental_insert_overwrite_partitions(spark, sf_small):
    """insert_overwrite replaces exactly the partitions the delta
    produced; untouched partitions keep their rows."""
    engine = prepared_engine(spark, sf_small)
    base = ModelSpec(
        name="typed_incr",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="insert_overwrite",
        partition_by=("event_type",),
        sql="""
SELECT user_id, value, event_type
FROM {{ source('joshua_dataset', 'events') }}
""",
    )
    _register_and_build(engine, base)
    n_click = (
        spark.table("datamart.typed_incr").filter("event_type = 'click'").count()
    )
    n_view = spark.table("datamart.typed_incr").filter("event_type = 'view'").count()
    assert n_click > 0 and n_view > 0

    # Delta touches only the click partition, halving it.
    delta = ModelSpec(
        name="typed_incr",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="insert_overwrite",
        partition_by=("event_type",),
        sql="""
SELECT user_id, value, event_type
FROM {{ source('joshua_dataset', 'events') }}
WHERE event_type = 'click' AND user_id % 2 = 0
""",
    )
    _register_and_build(engine, delta)
    out = spark.table("datamart.typed_incr")
    assert out.filter("event_type = 'view'").count() == n_view  # untouched
    clicks = out.filter("event_type = 'click'")
    assert 0 < clicks.count() < n_click  # replaced, not appended
    assert clicks.filter("user_id % 2 = 1").count() == 0


def test_full_refresh_rebuilds(spark, sf_small):
    """--full-refresh drops the incremental target and rebuilds from
    scratch (is_incremental() blocks stripped)."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="events_fr",
        kind="incremental",
        database="datamart",
        dialect="spark",
        sql="""
SELECT event_id, ts FROM {{ source('joshua_dataset', 'events') }}
{% if is_incremental() %}
WHERE ts > (SELECT max(ts) FROM {{ this }})
{% endif %}
""",
    )
    engine.register(spec, replace=True)
    engine.build(select=["events_fr"])
    n = spark.table("datamart.events_fr").count()
    # Poison the watermark so only a full refresh can heal the table.
    spark.sql(
        "INSERT INTO datamart.events_fr SELECT -1, TIMESTAMP_NTZ '2999-01-01 00:00:00'"
    )
    assert spark.table("datamart.events_fr").count() == n + 1
    # Incremental run: watermark poisoned to 2999 -> inserts nothing.
    engine.build(select=["events_fr"])
    assert spark.table("datamart.events_fr").count() == n + 1
    # Full refresh: drop + rebuild = clean state.
    engine.build(select=["events_fr"], full_refresh=True)
    assert spark.table("datamart.events_fr").count() == n
