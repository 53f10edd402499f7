"""Snapshot (SCD Type-2) materialization."""

from __future__ import annotations

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.models.core import EngineError, ModelSpec


def _spec(sql, **kw):
    defaults = dict(
        name="user_profile_snap",
        kind="snapshot",
        database="datamart",
        dialect="spark",
        unique_key="user_id",
        snapshot_strategy="timestamp",
        updated_at="last_seen",
    )
    defaults.update(kw)
    return ModelSpec(sql=sql, **defaults)


# Per-user profile as-of a cutoff: moving the cutoff forward simulates
# source rows changing between snapshot runs against static testdata.
_PROFILE_SQL = """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       max(ts) AS last_seen
FROM {{ source('joshua_dataset', 'events') }}
WHERE ts <= (SELECT min(ts) + INTERVAL %s HOURS FROM src.events)
GROUP BY user_id
"""


def test_snapshot_scd2_lifecycle(spark, sf_small):
    engine = prepared_engine(spark, sf_small)

    # Run 1: profiles from the first 2 hours of events.
    engine.register(_spec(_PROFILE_SQL % 2), replace=True)
    engine.build(select=["user_profile_snap"])
    snap1 = spark.table("datamart.user_profile_snap")
    n_users_1 = snap1.count()
    assert n_users_1 > 0
    assert snap1.filter("dbt_valid_to IS NOT NULL").count() == 0  # all current
    meta = dict(snap1.dtypes)
    assert meta["dbt_valid_from"] == "timestamp_ntz"
    assert meta["dbt_valid_to"] == "timestamp_ntz"

    # Run 2: cutoff advances -> users with new events change (last_seen
    # moves), brand-new users appear, quiet users stay unchanged.
    engine.register(_spec(_PROFILE_SQL % 6), replace=True)
    engine.build(select=["user_profile_snap"])
    snap2 = spark.table("datamart.user_profile_snap")

    closed = snap2.filter("dbt_valid_to IS NOT NULL")
    current = snap2.filter("dbt_valid_to IS NULL")
    assert closed.count() > 0, "active users must have a closed v1 row"
    # Current state must equal the fresh body exactly (SCD2 invariant).
    fresh = spark.sql(
        engine.render(engine.models["user_profile_snap"])
    )
    assert current.count() == fresh.count()
    got = {
        (r.user_id, r.n_events, r.total_value) for r in current.collect()
    }
    want = {
        (r.user_id, r.n_events, r.total_value) for r in fresh.collect()
    }
    assert got == want
    # Closed rows carry valid_to = successor's valid_from.
    pair = spark.sql(
        """
        SELECT count(*) AS bad FROM (
          SELECT c.user_id FROM datamart.user_profile_snap c
          JOIN datamart.user_profile_snap n
            ON c.user_id = n.user_id AND c.dbt_valid_to IS NOT NULL
               AND n.dbt_valid_to IS NULL
          WHERE c.dbt_valid_to <> n.dbt_valid_from
        )
        """
    ).collect()[0][0]
    assert pair == 0

    # Run 3 with an identical body: nothing changes (idempotent).
    # (Materialize counts first: snap2's plan pins pre-swap files.)
    n_total_2, n_closed_2 = snap2.count(), closed.count()
    engine.build(select=["user_profile_snap"])
    snap3 = spark.table("datamart.user_profile_snap")
    assert snap3.count() == n_total_2
    assert snap3.filter("dbt_valid_to IS NOT NULL").count() == n_closed_2


def test_snapshot_check_strategy(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    sql1 = """
SELECT user_id, count(*) AS n_events
FROM {{ source('joshua_dataset', 'events') }}
WHERE event_type IN ('click') GROUP BY user_id
"""
    sql2 = """
SELECT user_id, count(*) AS n_events
FROM {{ source('joshua_dataset', 'events') }}
WHERE event_type IN ('click', 'view') GROUP BY user_id
"""
    spec1 = _spec(
        sql1,
        name="clicks_snap",
        snapshot_strategy="check",
        updated_at=None,
        check_cols=("n_events",),
    )
    engine.register(spec1, replace=True)
    engine.build(select=["clicks_snap"])
    n1 = spark.table("datamart.clicks_snap").count()

    engine.register(
        _spec(
            sql2,
            name="clicks_snap",
            snapshot_strategy="check",
            updated_at=None,
            check_cols=("n_events",),
        ),
        replace=True,
    )
    engine.build(select=["clicks_snap"])
    snap = spark.table("datamart.clicks_snap")
    assert snap.filter("dbt_valid_to IS NOT NULL").count() > 0  # changed counts
    assert snap.count() > n1
    # Current rows equal the new body.
    cur = {(r.user_id, r.n_events) for r in snap.filter("dbt_valid_to IS NULL").collect()}
    fresh = {(r.user_id, r.n_events) for r in spark.sql(
        engine.render(engine.models["clicks_snap"])).collect()}
    assert cur == fresh


def test_snapshot_requires_unique_key():
    with pytest.raises(EngineError, match="unique_key"):
        ModelSpec(name="x", kind="snapshot", sql="SELECT 1")


def test_snapshot_schema_drift_raises(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    engine.register(
        _spec(
            "SELECT user_id, max(ts) AS last_seen FROM src.events GROUP BY user_id",
            name="drift_snap",
        ),
        replace=True,
    )
    engine.build(select=["drift_snap"])
    engine.register(
        _spec(
            "SELECT user_id, max(ts) AS last_seen, 1 AS extra "
            "FROM src.events GROUP BY user_id",
            name="drift_snap",
        ),
        replace=True,
    )
    with pytest.raises(EngineError, match="do not match"):
        engine.build(select=["drift_snap"])


def test_snapshot_invalidate_hard_deletes(spark, sf_small):
    """dbt's invalidate_hard_deletes: keys the source stops returning
    close at the run clock (default keeps them open forever)."""
    engine = prepared_engine(spark, sf_small)
    # Run 1: users 0..9 present.
    base = """
    SELECT user_id, count(*) AS n_events, max(ts) AS last_seen
    FROM {{ source('joshua_dataset', 'events') }}
    WHERE user_id < %d GROUP BY user_id
    """
    engine.register(
        _spec(base % 10, name="hd_snap", invalidate_hard_deletes=True),
        replace=True,
    )
    engine.build(select=["hd_snap"])
    assert spark.table("datamart.hd_snap").filter(
        "dbt_valid_to IS NOT NULL"
    ).count() == 0

    # Run 2: users 5..9 vanish from the source.
    engine.register(
        _spec(base % 5, name="hd_snap", invalidate_hard_deletes=True),
        replace=True,
    )
    engine.build(select=["hd_snap"])
    snap = spark.table("datamart.hd_snap")
    gone = snap.filter("user_id >= 5")
    assert gone.count() > 0
    # Every vanished key's row is closed; surviving keys stay open.
    assert gone.filter("dbt_valid_to IS NULL").count() == 0
    assert snap.filter("user_id < 5 AND dbt_valid_to IS NULL").count() > 0
