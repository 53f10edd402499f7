"""Sink-layout tests: partitioned writes prune, bucketed joins don't shuffle."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from dbt_bigquery_udf_spark.plans import plan_facts
from dbt_bigquery_udf_spark.sources.registry import register_sources
from dbt_bigquery_udf_spark.sources.sinks import write_bucketed, write_partitioned


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return register_sources(spark, sf_small, tables=("documents",))["documents"]


def test_partitioned_write_prunes(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink") / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])
    # Hive-style layout: one directory per partition value.
    dirs = {os.path.basename(p) for p in glob.glob(os.path.join(out, "lang=*"))}
    assert dirs == {f"lang={r[0]}" for r in docs.select("lang").distinct().collect()}
    # A filter on the partition key prunes to that directory's files only.
    back = spark.read.parquet(out)
    f = plan_facts(back.filter(back.lang == "en"))
    assert "PartitionFilters" in f.text and "lang" in f.text
    assert back.filter(back.lang == "en").count() == docs.filter(docs.lang == "en").count()


def test_bucketed_join_avoids_shuffle(spark, docs):
    spark.sql("CREATE DATABASE IF NOT EXISTS sinktest")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("sinktest.docs_a", "sinktest.docs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # The metastore is per-session but the warehouse dir persists; an
        # aborted prior run can leave an orphaned location DROP won't clear.
        shutil.rmtree(os.path.join(warehouse, "sinktest.db", t.split(".")[1]),
                      ignore_errors=True)
        write_bucketed(docs.select("doc_id", "n_chars"), t, ["doc_id"], 4, sort_by=["doc_id"])
    a, b = spark.table("sinktest.docs_a"), spark.table("sinktest.docs_b")
    joined = a.join(b, "doc_id")
    f = plan_facts(joined)
    # Equal bucketing on the join key: no Exchange on either side.
    assert f.exchanges == 0, f.text
    assert joined.count() == docs.count()
