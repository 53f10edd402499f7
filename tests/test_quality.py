"""Schema tests (`dbt test` surface) and seed materialization."""

from __future__ import annotations

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.models.core import EngineError, ModelSpec
from dbt_bigquery_udf_spark.models.quality import (
    accepted_values,
    not_null,
    relationships,
    run_tests,
    unique,
)
from dbt_bigquery_udf_spark.models.reference import reference_tests


def test_reference_suite_passes(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    results = run_tests(spark, engine, reference_tests())
    assert len(results) == 4
    for res in results:
        assert res.passed, (res.test.name, res.n_failures)


def test_failing_tests_report_counts(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    dm = engine.relations["test_datamart"].qualified
    # dbt's failures number = row count of the compiled test query: for
    # accepted_values that's one per violating VALUE (the query groups).
    n_vals = spark.sql(
        f"SELECT count(DISTINCT column1) FROM {dm} WHERE column1 IS NOT NULL"
    ).collect()[0][0]
    expected_orphans = spark.sql(
        f"SELECT count(*) FROM (SELECT column1 FROM {dm} WHERE column1 IS NOT NULL) c "
        "LEFT ANTI JOIN src.events p ON c.column1 = p.user_id"
    ).collect()[0][0]
    assert expected_orphans > 0  # fixture sanity: some event_ids exceed user range
    results = run_tests(
        spark,
        engine,
        [
            # Every value violates an impossible accepted set.
            accepted_values("test_datamart", "column1", ["-1"]),
            # Referential check against a parent that misses some keys.
            relationships("test_datamart", "column1", "src.events", "user_id"),
        ],
    )
    assert results[0].n_failures == n_vals
    assert not results[0].passed
    assert results[1].n_failures == expected_orphans


def test_unique_counts_duplicated_values(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    # events.user_id repeats heavily: unique() must count one failure
    # per duplicated VALUE (upstream dbt's semantics — the row count of
    # the compiled grouped query), and the suite addresses sources too.
    dup = spark.sql(
        "SELECT count(*) FROM (SELECT 1 FROM src.events "
        "WHERE user_id IS NOT NULL GROUP BY user_id HAVING count(*) > 1)"
    ).collect()[0][0]
    assert dup > 0  # fixture sanity

    # Build a tiny model over events to run unique() against a model.
    engine.register(
        ModelSpec(
            name="events_users",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="SELECT user_id FROM {{ source('joshua_dataset', 'events') }}",
        )
    )
    engine.build(select=["events_users"])
    res = run_tests(spark, engine, [unique("events_users", "user_id")])[0]
    assert res.n_failures == dup


def test_unbuilt_model_raises(spark, sf_small):
    engine = prepared_engine(spark, sf_small)
    with pytest.raises(EngineError, match="not built"):
        run_tests(spark, engine, [not_null("nope", "x")])


def test_seed_materialization(spark, sf_small, tmp_path):
    csv = tmp_path / "country_codes.csv"
    csv.write_text("code,name,population\nTW,Taiwan,23\nJP,Japan,125\nDE,Germany,83\n")
    engine = prepared_engine(spark, sf_small)
    engine.register(
        ModelSpec(
            name="country_codes",
            kind="seed",
            database="datamart",
            sql=str(csv),
            description="ISO country seed",
            columns={"code": "ISO-3166 alpha-2"},
            seed_column_types=(
                ("code", "STRING"),
                ("name", "STRING"),
                ("population", "INT64"),
            ),
        )
    )
    rels = engine.build(select=["country_codes"])
    rel = rels["country_codes"]
    rows = spark.table(rel.qualified).orderBy("code").collect()
    assert [(r.code, r.population) for r in rows] == [
        ("DE", 83),
        ("JP", 125),
        ("TW", 23),
    ]
    assert dict(spark.table(rel.qualified).dtypes)["population"] == "bigint"
    # persist_docs applies to seeds (table comment + column comment).
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {rel.qualified}").collect()
    blob = "\n".join(str(r) for r in detail)
    assert "ISO country seed" in blob
    # Seeds are downstream-refable like any model.
    engine.register(
        ModelSpec(
            name="big_countries",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="SELECT code FROM {{ ref('country_codes') }} WHERE population > 50",
        )
    )
    engine.build(select=["big_countries"])
    got = {r.code for r in spark.table("datamart.big_countries").collect()}
    assert got == {"JP", "DE"}


def test_store_failures_and_severity(spark, sf_small):
    """dbt's store_failures: a failing test materializes its violating
    rows to the audit schema; severity='warn' downgrades the outcome
    without hiding the count."""
    engine = prepared_engine(spark, sf_small)
    dm = engine.relations["test_datamart"].qualified
    n_rows = spark.table(dm).count()
    n_vals = spark.sql(
        f"SELECT count(DISTINCT column1) FROM {dm} WHERE column1 IS NOT NULL"
    ).collect()[0][0]
    failing = accepted_values("test_datamart", "column1", ["-1"])
    import dataclasses

    warn_only = dataclasses.replace(failing, severity="warn")
    res, wres = run_tests(
        spark, engine, [failing, warn_only], store_failures=True
    )
    assert res.status == "fail" and wres.status == "warn"
    # failures = one per violating value (dbt's compiled-query rows)...
    assert res.n_failures == n_vals == wres.n_failures
    # Violating rows landed in the audit schema, queryable post-mortem.
    assert res.audit_table == f"dbt_test__audit.{failing.name}"
    audit = spark.table(res.audit_table)
    assert audit.columns == ["value", "n"]
    # ...while the audit table keeps the per-value row counts, whose
    # sum is still every violating row.
    assert audit.agg({"n": "sum"}).collect()[0][0] == n_rows
    # Passing tests never write audit tables.
    ok = run_tests(
        spark, engine, [not_null("test_datamart", "column1")], store_failures=True
    )[0]
    assert ok.status == "pass" and ok.audit_table is None


def test_singular_data_test(spark, sf_small):
    """dbt singular tests: hand-written SQL whose rows are violations,
    with ref() resolution against the engine."""
    from dbt_bigquery_udf_spark.models.quality import SingularTest
    from dbt_bigquery_udf_spark.models.reference import reference_singular_tests

    engine = prepared_engine(spark, sf_small)
    results = run_tests(spark, engine, reference_singular_tests())
    assert all(r.passed for r in results), [
        (r.test.name, r.n_failures) for r in results
    ]
    # A deliberately-failing singular test counts its rows.
    bad = SingularTest(
        name="datamart_everything_fails",
        sql="SELECT column1 FROM {{ ref('test_datamart') }}",
    )
    res = run_tests(spark, engine, [bad])[0]
    assert res.n_failures == spark.table(
        engine.relations["test_datamart"].qualified
    ).count()
    assert res.status == "fail"


def test_source_freshness(spark, sf_small):
    from datetime import timedelta

    from dbt_bigquery_udf_spark.models.quality import check_source_freshness

    prepared_engine(spark, sf_small)  # registers src.events
    max_ts = spark.sql("SELECT max(ts) FROM src.events").collect()[0][0]
    fresh = check_source_freshness(
        spark, "src.events", "ts", 24, 72, as_of=max_ts + timedelta(hours=1)
    )
    assert fresh.status == "pass" and 0 < fresh.age_hours <= 24
    warn = check_source_freshness(
        spark, "src.events", "ts", 24, 72, as_of=max_ts + timedelta(hours=48)
    )
    assert warn.status == "warn"
    stale = check_source_freshness(
        spark, "src.events", "ts", 24, 72, as_of=max_ts + timedelta(hours=100)
    )
    assert stale.status == "error"
