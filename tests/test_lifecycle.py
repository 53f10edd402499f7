"""dbt-bigquery table lifecycle options: hours_to_expiration,
partition_expiration_days, require_partition_filter."""

from __future__ import annotations

import time

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.catalog import EngineError
from dbt_bigquery_udf_spark.models.core import ModelSpec


def _build(engine, spec):
    engine.register(spec, replace=True)
    engine.build(select=[spec.name])


def test_hours_to_expiration_sweeps_table(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    spec = ModelSpec(
        name="ttl_tbl",
        kind="table",
        database="datamart",
        dialect="spark",
        hours_to_expiration=1,
        sql="SELECT 1 AS x",
    )
    _build(engine, spec)
    assert spark.catalog.tableExists("datamart.ttl_tbl")
    # Not yet expired.
    assert engine.sweep_expired() == {"tables": [], "partitions": []}
    assert spark.catalog.tableExists("datamart.ttl_tbl")
    # One hour + a minute later: reaped.
    swept = engine.sweep_expired(now=time.time() + 3660)
    assert swept["tables"] == ["datamart.ttl_tbl"]
    assert not spark.catalog.tableExists("datamart.ttl_tbl")


def test_partition_expiration_drops_old_days(spark, sf_small):
    from datetime import datetime

    engine = prepared_engine(spark, sf_small)
    spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 8), "old"),
            (2, datetime(2026, 8, 1, 8), "newer"),
        ],
        "event_id int, ts timestamp_ntz, v string",
    ).createOrReplaceTempView("pexp_v")
    spec = ModelSpec(
        name="pexp_tbl",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        partition_expiration_days=30,
        sql="SELECT * FROM pexp_v",
    )
    _build(engine, spec)
    assert spark.table("datamart.pexp_tbl").count() == 2
    # "Now" = 2026-08-10: the Jan 1 partition is > 30 days old.
    now = datetime(2026, 8, 10).timestamp()
    swept = engine.sweep_expired(now=now)
    assert swept["partitions"] == ["datamart.pexp_tbl/batch_key=2026-01-01"]
    rows = spark.table("datamart.pexp_tbl").collect()
    assert [r.event_id for r in rows] == [2]


def test_require_partition_filter_guard(spark, sf_small):
    from datetime import datetime

    engine = prepared_engine(spark, sf_small)
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 8), "a"), (2, datetime(2026, 1, 2, 8), "b")],
        "event_id int, ts timestamp_ntz, v string",
    ).createOrReplaceTempView("rpf_v")
    spec = ModelSpec(
        name="rpf_tbl",
        kind="incremental",
        database="datamart",
        dialect="spark",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        require_partition_filter=True,
        sql="SELECT * FROM rpf_v",
    )
    _build(engine, spec)
    full_scan = spark.sql("SELECT count(*) FROM datamart.rpf_tbl")
    with pytest.raises(EngineError, match="require_partition_filter"):
        engine.enforce_partition_filters(full_scan)
    pruned = spark.sql(
        "SELECT count(*) FROM datamart.rpf_tbl WHERE batch_key = '2026-01-01'"
    )
    engine.enforce_partition_filters(pruned)  # no raise
    # Unrelated tables stay unguarded.
    engine.enforce_partition_filters(spark.sql("SELECT 1"))


# -- targeted deletion (GDPR erasure) -------------------------------------


def test_delete_rows_partition_scoped(spark, sf_small):
    """Deleting a key rewrites only the partitions that key lives in;
    other partitions keep their files byte-identical."""
    import glob
    import os
    from urllib.parse import urlparse

    engine = prepared_engine(spark, sf_small)
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2")],
        "k int, v string, p string",
    ).createOrReplaceTempView("del_v")
    spec = ModelSpec(
        name="del_tbl",
        kind="incremental",
        database="datamart",
        dialect="spark",
        unique_key="k",
        partition_by=("p",),
        sql="SELECT * FROM del_v",
    )
    _build(engine, spec)

    loc = urlparse(
        next(
            r[1]
            for r in spark.sql("DESCRIBE TABLE EXTENDED datamart.del_tbl").collect()
            if r[0] == "Location"
        )
    ).path
    p1 = os.path.join(loc, "p=p1")
    before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(p1, "*.parquet"))}
    assert before

    assert engine.delete_rows("del_tbl", [3]) == 1
    got = sorted(r.k for r in spark.table("datamart.del_tbl").collect())
    assert got == [1, 2, 4]
    after = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(p1, "*.parquet"))}
    assert after == before  # p1 untouched

    # Absent key: no-op, nothing rewritten.
    assert engine.delete_rows("del_tbl", [999]) == 0


def test_delete_rows_unpartitioned_swap(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).createOrReplaceTempView("del2_v")
    spec = ModelSpec(
        name="del2_tbl",
        kind="table",
        database="datamart",
        dialect="spark",
        unique_key="k",
        sql="SELECT * FROM del2_v",
    )
    _build(engine, spec)
    assert engine.delete_rows("del2_tbl", [1, 3, 42]) == 2
    assert [r.k for r in spark.table("datamart.del2_tbl").collect()] == [2]


def test_delete_rows_uncastable_key_raises(spark, sf_small):
    """An erasure key that cannot cast to the key column's type must
    raise — a deletion that silently matches nothing would report
    success on a no-op (GDPR compliance failure)."""
    import pytest

    from dbt_bigquery_udf_spark.api import prepared_engine
    from dbt_bigquery_udf_spark.models.core import EngineError

    engine = prepared_engine(spark, sf_small)
    with pytest.raises(EngineError, match="not castable"):
        engine.delete_rows("test_datamart", ["not-a-number"], key_col="column1")
