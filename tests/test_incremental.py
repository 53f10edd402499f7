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


# -- merge strategy (dbt-bigquery's default) ------------------------------


def _set_view(spark, name, rows, schema):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


def test_merge_upserts_and_is_idempotent(spark, sf_small):
    """merge: matched keys update, unmatched insert, absent keys kept;
    re-running the same batch is a no-op."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="merge_tgt",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="merge",
        unique_key="k",
        sql="SELECT * FROM merge_src_v",
    )
    _set_view(spark, "merge_src_v", [(1, "a"), (2, "b")], "k int, v string")
    _register_and_build(engine, spec)
    _set_view(spark, "merge_src_v", [(2, "B"), (3, "c")], "k int, v string")
    for _ in range(2):  # second pass: idempotence
        _register_and_build(engine, spec)
        got = {r.k: r.v for r in spark.table("datamart.merge_tgt").collect()}
        assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_update_columns_limits_update(spark, sf_small):
    """merge_update_columns: MATCHED rows take only the listed columns
    from the batch; other columns keep their target values."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="merge_muc",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="merge",
        unique_key="k",
        merge_update_columns=("v",),
        sql="SELECT * FROM merge_muc_v",
    )
    _set_view(spark, "merge_muc_v", [(1, "a", 10)], "k int, v string, w int")
    _register_and_build(engine, spec)
    _set_view(spark, "merge_muc_v", [(1, "A", 99), (2, "b", 20)], "k int, v string, w int")
    _register_and_build(engine, spec)
    got = {r.k: (r.v, r.w) for r in spark.table("datamart.merge_muc").collect()}
    # matched row: v updated, w kept; new row: inserted whole.
    assert got == {1: ("A", 10), 2: ("b", 20)}


def test_merge_partition_scoped_rewrite(spark, sf_small):
    """Partitioned merge rewrites only the partitions the batch touches:
    untouched partitions keep their parquet files byte-identical."""
    import glob
    import os
    from urllib.parse import urlparse

    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="merge_part",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="merge",
        unique_key="k",
        partition_by=("p",),
        sql="SELECT * FROM merge_part_v",
    )
    _set_view(
        spark,
        "merge_part_v",
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2")],
        "k int, v string, p string",
    )
    _register_and_build(engine, spec)

    loc = urlparse(
        next(
            r[1]
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED datamart.merge_part"
            ).collect()
            if r[0] == "Location"
        )
    ).path
    p1_files_before = {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(loc, "p=p1", "*.parquet"))
    }
    assert p1_files_before

    # Batch touches only p2: update k=4, insert k=5.
    _set_view(
        spark, "merge_part_v", [(4, "D", "p2"), (5, "e", "p2")], "k int, v string, p string"
    )
    _register_and_build(engine, spec)

    got = {r.k: (r.v, r.p) for r in spark.table("datamart.merge_part").collect()}
    assert got == {
        1: ("a", "p1"),
        2: ("b", "p1"),
        3: ("c", "p2"),  # absent from batch but in touched partition: kept
        4: ("D", "p2"),
        5: ("e", "p2"),
    }
    p1_files_after = {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(loc, "p=p1", "*.parquet"))
    }
    assert p1_files_after == p1_files_before  # p1 never rewritten


# -- on_schema_change ------------------------------------------------------


def test_on_schema_change_fail_raises(spark, sf_small):
    from dbt_bigquery_udf_spark.catalog import EngineError
    import pytest

    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="osc_fail",
        kind="incremental",
        database="datamart",
        dialect="spark",
        on_schema_change="fail",
        sql="SELECT * FROM osc_fail_v",
    )
    _set_view(spark, "osc_fail_v", [(1, "a")], "k int, v string")
    _register_and_build(engine, spec)
    _set_view(spark, "osc_fail_v", [(2, "b", 1.5)], "k int, v string, extra double")
    with pytest.raises(EngineError, match="on_schema_change"):
        _register_and_build(engine, spec)


def test_on_schema_change_ignore_drops_new_columns(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="osc_ign",
        kind="incremental",
        database="datamart",
        dialect="spark",
        sql="SELECT * FROM osc_ign_v",
    )
    _set_view(spark, "osc_ign_v", [(1, "a")], "k int, v string")
    _register_and_build(engine, spec)
    _set_view(spark, "osc_ign_v", [(2, "b", 1.5)], "k int, v string, extra double")
    _register_and_build(engine, spec)
    out = spark.table("datamart.osc_ign")
    assert out.columns == ["k", "v"]
    assert out.count() == 2


def test_on_schema_change_append_new_columns(spark, sf_small):
    """New batch columns are ALTERed in; pre-existing rows read NULL
    (parquet schema evolution)."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="osc_app",
        kind="incremental",
        database="datamart",
        dialect="spark",
        on_schema_change="append_new_columns",
        sql="SELECT * FROM osc_app_v",
    )
    _set_view(spark, "osc_app_v", [(1, "a")], "k int, v string")
    _register_and_build(engine, spec)
    _set_view(spark, "osc_app_v", [(2, "b", 1.5)], "k int, v string, extra double")
    _register_and_build(engine, spec)
    got = {r.k: r.extra for r in spark.table("datamart.osc_app").collect()}
    assert got == {1: None, 2: 1.5}


def test_on_schema_change_sync_drops_via_merge(spark, sf_small):
    """sync_all_columns on the (unpartitioned) merge strategy drops
    removed columns — the full rewrite pays for the narrowing."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="osc_sync",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="merge",
        unique_key="k",
        on_schema_change="sync_all_columns",
        sql="SELECT * FROM osc_sync_v",
    )
    _set_view(spark, "osc_sync_v", [(1, "a", 10)], "k int, v string, w int")
    _register_and_build(engine, spec)
    _set_view(spark, "osc_sync_v", [(2, "b")], "k int, v string")
    _register_and_build(engine, spec)
    out = spark.table("datamart.osc_sync")
    assert out.columns == ["k", "v"]
    assert {r.k: r.v for r in out.collect()} == {1: "a", 2: "b"}


# -- microbatch strategy (dbt >= 1.9) -------------------------------------


def _ts_view(spark, name, rows):
    spark.createDataFrame(rows, "event_id int, ts timestamp_ntz, v string").createOrReplaceTempView(name)


def test_microbatch_first_run_batches_all_days(spark, sf_small):
    from datetime import datetime

    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="mb_tgt",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        sql="SELECT * FROM mb_src_v",
    )
    _ts_view(
        spark,
        "mb_src_v",
        [
            (1, datetime(2026, 1, 1, 8), "a"),
            (2, datetime(2026, 1, 2, 9), "b"),
            (3, datetime(2026, 1, 3, 10), "c"),
        ],
    )
    _register_and_build(engine, spec)
    out = spark.table("datamart.mb_tgt")
    assert out.count() == 3
    assert sorted(r[0] for r in out.select("batch_key").distinct().collect()) == [
        "2026-01-01",
        "2026-01-02",
        "2026-01-03",
    ]


def test_microbatch_lookback_heals_late_arrivals(spark, sf_small):
    """Incremental run re-processes [hwm - lookback, newest]: late rows
    inside the window are healed, older ones are not; partitions before
    the window keep their files untouched."""
    import glob
    import os
    from datetime import datetime
    from urllib.parse import urlparse

    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="mb_late",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        lookback=1,
        sql="SELECT * FROM mb_late_v",
    )
    base = [
        (1, datetime(2026, 1, 1, 8), "a"),
        (2, datetime(2026, 1, 2, 9), "b"),
        (3, datetime(2026, 1, 3, 10), "c"),
    ]
    _ts_view(spark, "mb_late_v", base)
    _register_and_build(engine, spec)

    loc = urlparse(
        next(
            r[1]
            for r in spark.sql("DESCRIBE TABLE EXTENDED datamart.mb_late").collect()
            if r[0] == "Location"
        )
    ).path
    d1 = os.path.join(loc, "batch_key=2026-01-01")
    d1_before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(d1, "*.parquet"))}
    assert d1_before

    # hwm = Jan 3, lookback 1 -> window starts Jan 2. The Jan 1 late
    # row is outside, the Jan 2 late row inside, Jan 4 is new.
    _ts_view(
        spark,
        "mb_late_v",
        base
        + [
            (10, datetime(2026, 1, 1, 23), "late-outside"),
            (11, datetime(2026, 1, 2, 23), "late-inside"),
            (12, datetime(2026, 1, 4, 6), "new-day"),
        ],
    )
    _register_and_build(engine, spec)

    got = {r.event_id for r in spark.table("datamart.mb_late").collect()}
    assert got == {1, 2, 3, 11, 12}  # 10 outside lookback: not healed
    d1_after = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(d1, "*.parquet"))}
    assert d1_after == d1_before  # Jan 1 partition never rewritten


def test_microbatch_begin_bounds_first_run(spark, sf_small):
    from datetime import datetime

    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="mb_begin",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        begin="2026-01-02",
        sql="SELECT * FROM mb_begin_v",
    )
    _ts_view(
        spark,
        "mb_begin_v",
        [
            (1, datetime(2026, 1, 1, 8), "ancient"),
            (2, datetime(2026, 1, 2, 9), "b"),
            (3, datetime(2026, 1, 3, 10), "c"),
        ],
    )
    _register_and_build(engine, spec)
    got = {r.event_id for r in spark.table("datamart.mb_begin").collect()}
    assert got == {2, 3}


def test_merge_incremental_predicates_bound_join_but_keep_rows(spark, sf_small):
    """incremental_predicates narrow the target-side join input; rows
    they exclude must survive the rewrite untouched — even when the
    batch carries their key (outside the predicate window, the merge
    must not see them)."""
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="merge_pred",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="merge",
        unique_key="k",
        incremental_predicates=("seg = 'hot'",),
        sql="SELECT * FROM merge_pred_v",
    )
    _set_view(
        spark,
        "merge_pred_v",
        [(1, "a", "hot"), (2, "b", "cold"), (3, "c", None)],
        "k int, v string, seg string",
    )
    _register_and_build(engine, spec)
    # Batch updates keys 1 (hot: merged) and 2 (cold: OUTSIDE the
    # predicate -> target row carried, batch row inserts as unmatched).
    _set_view(
        spark,
        "merge_pred_v",
        [(1, "A", "hot"), (2, "B", "hot"), (4, "d", "hot")],
        "k int, v string, seg string",
    )
    _register_and_build(engine, spec)
    got = sorted(
        (r.k, r.v, r.seg) for r in spark.table("datamart.merge_pred").collect()
    )
    assert got == [
        (1, "A", "hot"),  # matched inside predicate: updated
        (2, "B", "hot"),  # batch row inserted (target row was out of scope)
        (2, "b", "cold"),  # carried untouched — NOT deleted, NOT updated
        (3, "c", None),  # NULL predicate: carried, not lost
        (4, "d", "hot"),  # new key inserted
    ]


def test_insert_overwrite_static_partitions(spark, sf_small):
    """dbt-bigquery `partitions` config: the LISTED partitions are
    replaced even when the batch has no rows for them (dynamic mode
    would leave an emptied day stale), unlisted partitions untouched,
    and out-of-list batch rows never write."""
    import dataclasses

    engine = prepared_engine(spark, sf_small)
    base_sql = """
SELECT CAST(event_id AS BIGINT) AS event_id, value,
       CAST(ts AS DATE) AS day
FROM {{ source('joshua_dataset', 'events') }}
"""
    spec = ModelSpec(
        name="events_static_ow",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="insert_overwrite",
        partition_by=("day",),
        sql=base_sql,
    )
    _register_and_build(engine, spec)
    days = [
        r.day for r in spark.sql(
            "SELECT DISTINCT day FROM datamart.events_static_ow ORDER BY day"
        ).collect()
    ]
    assert len(days) >= 3
    d0, d1, d2 = str(days[0]), str(days[1]), str(days[2])
    before_d0 = spark.table("datamart.events_static_ow").filter(
        f"day = '{d0}'"
    ).count()

    # Run 2: declare [d1, d2] static, but produce rows ONLY for d1
    # (and a decoy row for d0, which must be filtered out).
    run2 = dataclasses.replace(
        spec,
        partitions=(d1, d2),
        sql=f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(-999.0 AS DOUBLE) AS value,
       CAST(ts AS DATE) AS day
FROM {{{{ source('joshua_dataset', 'events') }}}}
WHERE CAST(ts AS DATE) IN (DATE '{d0}', DATE '{d1}')
""",
    )
    _register_and_build(engine, run2)
    t = spark.table("datamart.events_static_ow")
    # d2 was listed and the batch had no rows for it -> emptied.
    assert t.filter(f"day = '{d2}'").count() == 0
    # d1 replaced with the sentinel-valued rows only.
    assert t.filter(f"day = '{d1}' AND value != -999.0").count() == 0
    assert t.filter(f"day = '{d1}'").count() > 0
    # d0 untouched: not listed, decoy rows filtered out.
    assert t.filter(f"day = '{d0}'").count() == before_d0
    assert t.filter(f"day = '{d0}' AND value = -999.0").count() == 0


def test_merge_into_sql_generation():
    """The lakehouse MERGE path emits the ANSI statement Delta/Iceberg
    execute: null-safe key ON, predicates ANDed into ON,
    update_columns restricting the MATCHED set, full INSERT list."""
    from dbt_bigquery_udf_spark.models.incremental import merge_into_sql

    sql = merge_into_sql(
        "datamart.t", "batch_v", "id", ["id", "v", "ts"],
    )
    assert sql == (
        "MERGE INTO `datamart`.`t` AS t USING `batch_v` AS s "
        "ON t.`id` <=> s.`id` "
        "WHEN MATCHED THEN UPDATE SET t.`v` = s.`v`, t.`ts` = s.`ts` "
        "WHEN NOT MATCHED THEN INSERT (`id`, `v`, `ts`) "
        "VALUES (s.`id`, s.`v`, s.`ts`)"
    )
    # composite key + predicates + restricted update set
    sql2 = merge_into_sql(
        "t", "b", "k1, k2", ["k1", "k2", "a", "b"],
        update_columns=("a",), predicates=("t.ts > '2024-01-01'",),
    )
    assert (
        "ON t.`k1` <=> s.`k1` AND t.`k2` <=> s.`k2` "
        "AND (t.ts > '2024-01-01')" in sql2
    )
    assert "UPDATE SET t.`a` = s.`a` " in sql2 and "t.`b` = s.`b`" not in sql2
    # keys-only update set degenerates to insert-only (no empty SET)
    sql3 = merge_into_sql("t", "b", "id", ["id"])
    assert "WHEN MATCHED" not in sql3 and "WHEN NOT MATCHED" in sql3
    # reserved words / special characters survive via backtick quoting
    sql4 = merge_into_sql(
        "db.order", "b", "select", ["select", "from", "da-sh"],
    )
    assert "MERGE INTO `db`.`order` AS t" in sql4
    assert "ON t.`select` <=> s.`select`" in sql4
    assert "t.`from` = s.`from`" in sql4 and "t.`da-sh` = s.`da-sh`" in sql4


def test_table_provider_probe_and_parquet_fallback(spark, sf_small):
    """table_provider reads the catalog's provider; a parquet target
    dispatches to the rewrite path (existing merge semantics unchanged
    — this is the format-flag fallback)."""
    from dbt_bigquery_udf_spark.models.incremental import (
        MERGE_CAPABLE_PROVIDERS,
        merge_upsert,
        table_provider,
    )

    import uuid as _uuid

    tbl = f"ops_merge.mt_{_uuid.uuid4().hex[:8]}"  # unique: stale
    # warehouse dirs from earlier processes keep the location
    spark.sql("CREATE DATABASE IF NOT EXISTS ops_merge")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    ).write.format("parquet").saveAsTable(tbl)
    assert table_provider(spark, tbl) == "parquet"
    assert "parquet" not in MERGE_CAPABLE_PROVIDERS
    batch = spark.createDataFrame([(2, "B"), (3, "c")], "id bigint, v string")
    merge_upsert(spark, tbl, batch, "id")
    rows = {(r.id, r.v) for r in spark.table(tbl).collect()}
    assert rows == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_dispatches_to_merge_into_on_capable_provider(spark, sf_small, monkeypatch):
    """When the target's provider is merge-capable, merge_upsert issues
    ONE native MERGE INTO (captured here — no Delta jars in the test
    env) and never touches the rewrite machinery."""
    from dbt_bigquery_udf_spark.models import incremental as inc

    import uuid as _uuid

    tbl = f"ops_merge.md_{_uuid.uuid4().hex[:8]}"
    spark.sql("CREATE DATABASE IF NOT EXISTS ops_merge")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.format(
        "parquet"
    ).saveAsTable(tbl)
    monkeypatch.setattr(inc, "table_provider", lambda s, t: "delta")
    issued = []
    real_sql = spark.sql

    class _FakeSpark:
        def __getattr__(self, name):
            return getattr(spark, name)

        def sql(self, q, **kw):
            if q.startswith("MERGE INTO"):
                issued.append(q)

                class _Done:
                    def collect(self_inner):
                        return []

                return _Done()
            return real_sql(q, **kw)

    batch = spark.createDataFrame([(2, "b")], "id bigint, v string")
    inc.merge_upsert(_FakeSpark(), tbl, batch, "id")
    assert len(issued) == 1
    db, name = tbl.split(".")
    assert issued[0].startswith(
        f"MERGE INTO `{db}`.`{name}` AS t USING `__merge_batch_"
    )
    assert "t.`id` <=> s.`id`" in issued[0]
