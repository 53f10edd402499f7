"""dbt 1.5 model versions + --defer --state (VERDICT r10 #3/#5).

Engine layer: versioned registration (`<name>.v<N>` keys, `_v<N>`
default aliases), ref('m') -> latest, ref('m', v=N) -> pinned,
latest_version override, deprecation warnings, selector routing.
Loader layer: schema.yml `versions:` blocks (defined_in, latest
fallback file, per-version config/columns).
Defer layer: a child builds against the state manifest's relations
without building its parents (dbt's Slim-CI completion).
"""

from __future__ import annotations

import json
import os

import pytest

from dbt_bigquery_udf_spark.api import prepared_engine
from dbt_bigquery_udf_spark.models.core import EngineError, ModelSpec


def _mk_versions(eng, base_sql_v1: str, base_sql_v2: str, **extra):
    eng.register(
        ModelSpec(
            name="dim_status",
            kind="view",
            database="datamart",
            dialect="spark",
            version=1,
            sql=base_sql_v1,
            **extra,
        ),
        ModelSpec(
            name="dim_status",
            kind="view",
            database="datamart",
            dialect="spark",
            version=2,
            sql=base_sql_v2,
            **extra,
        ),
        replace=True,
    )


V1_SQL = (
    "SELECT o_orderstatus AS st, count(*) AS n "
    "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
)
V2_SQL = (
    "SELECT o_orderstatus AS st, count(*) AS n, 2 AS v "
    "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
)


def test_versioned_registration_and_latest_ref(spark, sf_small):
    eng = prepared_engine(spark, sf_small)
    _mk_versions(eng, V1_SQL, V2_SQL)
    # registry keys + default dbt aliases
    assert "dim_status.v1" in eng.models and "dim_status.v2" in eng.models
    assert eng.models["dim_status.v1"].relation_name == "dim_status_v1"
    assert eng.models["dim_status.v2"].relation_name == "dim_status_v2"
    assert eng.latest_version_of("dim_status") == 2

    eng.register(
        ModelSpec(
            name="status_latest",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="SELECT st, n, v FROM {{ ref('dim_status') }}",
        ),
        ModelSpec(
            name="status_pinned",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="SELECT st, n FROM {{ ref('dim_status', v=1) }}",
        ),
        replace=True,
    )
    # DAG edges: unversioned ref -> latest key, pinned ref -> its key
    assert eng._edge_keys(eng.models["status_latest"]) == {"dim_status.v2"}
    assert eng._edge_keys(eng.models["status_pinned"]) == {"dim_status.v1"}
    eng.build(
        select=["status_latest", "status_pinned"], fail_fast=True
    )
    assert spark.table("datamart.dim_status_v1").columns == ["st", "n"]
    assert "v" in spark.table("datamart.status_latest").columns
    assert spark.table("datamart.status_pinned").columns == ["st", "n"]
    # both versions agree on the shared columns
    a = {r["st"]: r["n"] for r in spark.table("datamart.dim_status_v1").collect()}
    b = {r["st"]: r["n"] for r in spark.table("datamart.dim_status_v2").collect()}
    assert a == b and a


def test_latest_version_pin_and_conflicts(spark, sf_small):
    eng = prepared_engine(spark, sf_small)
    _mk_versions(eng, V1_SQL, V2_SQL, latest_version=1)
    # pinned latest: bare ref resolves to v1 even though v2 exists
    assert eng.latest_version_of("dim_status") == 1
    assert eng._ref_key("dim_status") == "dim_status.v1"
    assert eng._ref_key("dim_status", 2) == "dim_status.v2"
    with pytest.raises(EngineError, match="does not match a registered"):
        eng._ref_key("dim_status", 7)
    # conflicting latest_version declarations across version specs
    import dataclasses

    eng.register(
        dataclasses.replace(eng.models["dim_status.v2"], latest_version=2),
        replace=True,
    )
    with pytest.raises(EngineError, match="conflicting latest_version"):
        eng.latest_version_of("dim_status")


def test_version_name_collisions_rejected(spark, sf_small):
    eng = prepared_engine(spark, sf_small)
    _mk_versions(eng, V1_SQL, V2_SQL)
    with pytest.raises(EngineError, match="unversioned spec cannot share"):
        eng.register(
            ModelSpec(
                name="dim_status", kind="view", database="datamart",
                dialect="spark", sql=V1_SQL,
            )
        )
    eng2 = prepared_engine(spark, sf_small)
    eng2.register(
        ModelSpec(
            name="plain", kind="view", database="datamart",
            dialect="spark", sql=V1_SQL,
        ),
        replace=True,
    )
    with pytest.raises(EngineError, match="versioned spec cannot share"):
        eng2.register(
            ModelSpec(
                name="plain", kind="view", database="datamart",
                dialect="spark", version=1, sql=V1_SQL,
            )
        )


def test_select_by_bare_name_builds_latest(spark, sf_small):
    eng = prepared_engine(spark, sf_small, env="dev")
    _mk_versions(eng, V1_SQL, V2_SQL)
    rels = eng.build(select=["dim_status"], fail_fast=True)
    assert set(rels) == {"dim_status.v2"}
    assert spark.catalog.tableExists("datamart_dev.dim_status_v2")
    assert not spark.catalog.tableExists("datamart_dev.dim_status_v1")
    # pinning the selector to a version builds exactly that version
    rels = eng.build(select=["dim_status.v1"], fail_fast=True)
    assert set(rels) == {"dim_status.v1"}


def test_deprecation_warning_recorded(spark, sf_small):
    eng = prepared_engine(spark, sf_small)
    _mk_versions(eng, V1_SQL, V2_SQL)
    import dataclasses

    eng.register(
        dataclasses.replace(
            eng.models["dim_status.v1"], deprecation_date="2020-01-01"
        ),
        replace=True,
    )
    eng.register(
        ModelSpec(
            name="status_pinned_dep",
            kind="view",
            database="datamart",
            dialect="spark",
            sql="SELECT st FROM {{ ref('dim_status', v=1) }}",
        ),
        replace=True,
    )
    eng.build(select=["status_pinned_dep"], fail_fast=True)
    assert any(
        "dim_status.v1" in w and "deprecation_date" in w
        for w in eng.deprecation_warnings
    )
    # garbage dates are rejected at spec construction (dbt parse error)
    with pytest.raises(EngineError, match="deprecation_date"):
        ModelSpec(
            name="bad", kind="view", database="datamart", dialect="spark",
            sql="SELECT 1", deprecation_date="not-a-date",
        )


def test_project_loader_versions(spark, sf_small, tmp_path):
    """schema.yml versions: blocks load like dbt 1.5 — defined_in,
    the <name>_v<N> default, the bare-<name> latest fallback, and
    per-version column include/exclude."""
    from dbt_bigquery_udf_spark.project import load_project

    root = tmp_path / "proj"
    (root / "models").mkdir(parents=True)
    (root / "dbt_project.yml").write_text(
        "name: vdemo\nversion: '1.0'\nprofile: x\n"
    )
    # v1 in the default-stem file, v2 (latest) in the bare-name file
    (root / "models" / "fct_orders_v1.sql").write_text(
        "SELECT o_orderkey AS id, o_totalprice AS amount "
        "FROM {{ source('src', 'orders') }}"
    )
    (root / "models" / "fct_orders.sql").write_text(
        "SELECT o_orderkey AS id, CAST(round(o_totalprice * 100) AS BIGINT) "
        "AS amount_cents FROM {{ source('src', 'orders') }}"
    )
    (root / "models" / "consumer.sql").write_text(
        "{{ config(schema='datamart') }}\n"
        "SELECT id FROM {{ ref('fct_orders') }}"
    )
    (root / "models" / "consumer_old.sql").write_text(
        "{{ config(schema='datamart') }}\n"
        "SELECT amount FROM {{ ref('fct_orders', v=1) }}"
    )
    (root / "models" / "schema.yml").write_text(
        """
version: 2
models:
  - name: fct_orders
    description: versioned fact
    latest_version: 2
    config: {materialized: table, schema: datamart}
    columns:
      - name: id
        description: order key
      - name: amount
        description: total price
    versions:
      - v: 1
      - v: 2
        columns:
          - include: all
            exclude: [amount]
          - name: amount_cents
            description: integer cents
"""
    )
    proj = load_project(str(root))
    by_key = {m.registry_key: m for m in proj.models}
    assert {"fct_orders.v1", "fct_orders.v2", "consumer", "consumer_old"} <= set(
        by_key
    )
    assert by_key["fct_orders.v1"].version == 1
    assert by_key["fct_orders.v2"].latest_version == 2
    assert by_key["fct_orders.v2"].kind == "table"  # entry config applies
    # per-version column docs: v2 excludes `amount`, adds amount_cents
    assert "amount" in by_key["fct_orders.v1"].columns
    assert "amount" not in by_key["fct_orders.v2"].columns
    assert "amount_cents" in by_key["fct_orders.v2"].columns

    eng = prepared_engine(spark, sf_small)
    eng.register(*proj.models, replace=True)
    eng.build(
        select=["consumer", "consumer_old"], fail_fast=True
    )
    assert spark.catalog.tableExists("datamart.fct_orders_v2")
    assert spark.table("datamart.consumer_old").columns == ["amount"]


def test_defer_resolves_unselected_refs_to_state(spark, sf_small, tmp_path):
    """dbt --defer --state: the child builds against the PROD parent
    recorded in the state manifest; the parent is neither rebuilt nor
    required to exist in the dev env."""
    # prod: build parent + child, write state
    prod = prepared_engine(spark, sf_small)
    prod.register(
        ModelSpec(
            name="defer_parent", kind="table", database="datamart",
            dialect="spark",
            sql=(
                "SELECT o_orderstatus AS st, count(*) AS n "
                "FROM {{ source('src', 'orders') }} GROUP BY o_orderstatus"
            ),
        ),
        ModelSpec(
            name="defer_child", kind="table", database="datamart",
            dialect="spark",
            sql="SELECT st, n FROM {{ ref('defer_parent') }} WHERE n > 0",
        ),
        replace=True,
    )
    prod.build(select=["defer_child"], fail_fast=True)
    state = str(tmp_path / "state.json")
    prod.write_state(state)
    with open(state) as f:
        saved = json.load(f)
    assert saved["relations"]["defer_parent"] == "datamart.defer_parent"

    # dev: same specs, but ONLY the child selected with defer — the
    # parent never builds in dev, the ref resolves to prod's relation
    dev = prepared_engine(spark, sf_small, env="dev")
    spark.sql("DROP TABLE IF EXISTS datamart_dev.defer_parent")
    dev.register(*(prod.models[k] for k in ("defer_parent", "defer_child")),
                 replace=True)
    rels = dev.build(
        select=["defer_child"], defer=True, state=state, fail_fast=True
    )
    assert set(rels) == {"defer_child"}
    assert not spark.catalog.tableExists("datamart_dev.defer_parent")
    assert spark.catalog.tableExists("datamart_dev.defer_child")
    n_dev = spark.table("datamart_dev.defer_child").count()
    n_prod = spark.table("datamart.defer_child").count()
    assert n_dev == n_prod > 0

    # favor_state=False default: once the dev env HAS the parent, the
    # target relation wins over the state one (dbt's default)
    dev.build(select=["defer_parent"], fail_fast=True)
    # poison the dev parent so we can tell which relation the child read
    spark.sql("INSERT INTO datamart_dev.defer_parent VALUES ('ZZ', 1)")
    dev.build(select=["defer_child"], defer=True, state=state, fail_fast=True)
    assert (
        spark.table("datamart_dev.defer_child")
        .filter("st = 'ZZ'")
        .count()
        == 1
    )
    # favor_state=True: state relation wins even though dev has one
    dev.build(
        select=["defer_child"], defer=True, state=state,
        favor_state=True, fail_fast=True,
    )
    assert (
        spark.table("datamart_dev.defer_child").filter("st = 'ZZ'").count()
        == 0
    )

    # defer without state is a loud error
    with pytest.raises(EngineError, match="requires state"):
        dev.build(select=["defer_child"], defer=True)


def test_defer_cli_roundtrip(spark, sf_small, tmp_path):
    """CLI surface: write-state then build --defer --state builds the
    child against the recorded parents (exercised through the module
    entrypoint the way a user would)."""
    from dbt_bigquery_udf_spark.__main__ import main

    state = str(tmp_path / "cli_state.json")
    # prod pass: materialize the parents the deferred build will lean on
    assert main(["build", "--select", "test_datamart", "--sf-dir", sf_small]) == 0
    rc = main(["write-state", state, "--sf-dir", sf_small])
    assert rc == 0 and os.path.exists(state)
    rc = main(
        [
            "build", "--select", "test_datamart", "--defer",
            "--state", state, "--env", "ci", "--sf-dir", sf_small,
        ]
    )
    assert rc == 0
    assert spark.catalog.tableExists("datamart_ci.test_datamart")
