"""HLL_COUNT.* dialect mapping: transpile shape + estimate accuracy."""

from __future__ import annotations

from dbt_bigquery_udf_spark.functions.dialect import transpile_bq_expr
from dbt_bigquery_udf_spark import queries as Q


def test_hll_count_transpile_vectors():
    t = transpile_bq_expr
    # bare INIT emits BQ's default precision 15 explicitly (Spark's
    # default lgConfigK is 12 — a silent 2.8x accuracy downgrade)
    assert t("HLL_COUNT.INIT(x)") == "hll_sketch_agg(x, 15)"
    assert t("HLL_COUNT.INIT(x, 14)") == "hll_sketch_agg(x, 14)"
    assert t("HLL_COUNT.MERGE(sk)") == "hll_sketch_estimate(hll_union_agg(sk))"
    assert t("HLL_COUNT.MERGE_PARTIAL(sk)") == "hll_union_agg(sk)"
    assert t("HLL_COUNT.EXTRACT(sk)") == "hll_sketch_estimate(sk)"
    # precision beyond Spark's lgConfigK max passes through untouched
    # (visible failure over silent precision loss) ...
    assert "HLL_COUNT" in t("HLL_COUNT.INIT(x, 24)")
    # ... and the mapped forms are idempotent under a second pass.
    assert t(t("HLL_COUNT.MERGE(sk)")) == t("HLL_COUNT.MERGE(sk)")


def test_hll_rollup_estimates_near_exact(spark, sf_small):
    """The driver-contract output carries the exact count plus a
    Spark-side <=5% flag on the day-merged HLL estimate; both must hold
    against an independently computed exact distinct."""
    rows = Q.QUERIES["bq_dialect_hll_rollup"](spark, sf_small).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, count(DISTINCT user_id) AS n "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]], (r, exact)
        assert r["hll_within_5pct"] is True, r
