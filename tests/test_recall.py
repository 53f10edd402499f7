"""ANN recall properties: multi-probe recovers more of the brute-force
top-k than single-probe, at proportional scan cost (SURVEY.md §7 hard
part 5 — LSH ops get a recall assertion, not hash equality)."""

from __future__ import annotations

from dbt_bigquery_udf_spark import queries as Q


def _ids(spark, name, sf):
    return {r.vec_id for r in Q.QUERIES[name](spark, sf).collect()}


def test_multiprobe_recall_dominates_single_probe(spark, sf_small):
    brute = _ids(spark, "sim_topk_brute", sf_small)
    single = _ids(spark, "sim_lsh_topk", sf_small)
    multi = _ids(spark, "sim_lsh_multiprobe", sf_small)
    assert len(brute) == 10
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    # Monotone: widening the probe set can only add candidates, so the
    # true-neighbor overlap cannot shrink. (Absolute recall on this
    # synthetic corpus tracks fraction-scanned — the vectors are
    # near-random; see sim_lsh_multiprobe docstring.)
    assert r_multi >= r_single
    assert single <= multi or len(multi) == 10


def test_ivf_nprobe_recall_dominates_single_list(spark, sf_small):
    brute = _ids(spark, "sim_topk_brute", sf_small)
    single = _ids(spark, "sim_ivf_topk", sf_small)
    multi = _ids(spark, "sim_ivf_multiprobe", sf_small)
    assert len(brute & multi) >= len(brute & single)
