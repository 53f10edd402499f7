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


def test_rerank_results_come_from_probed_lists(spark, sf_small):
    """Two-stage rerank is a refinement of the multiprobe scan: its
    top-k must be drawn from the SAME probed lists (a result outside
    them would mean the shortlist leaked), its exact-cosine ordering
    of the shortlist cannot beat multiprobe's direct exact ordering of
    the full probed set (shortlist truncation only removes candidates),
    and the cheap-score stage must still agree with the full-precision
    ranking on most of the top-k (the dims-prefix score is a usable
    surrogate)."""
    brute = _ids(spark, "sim_topk_brute", sf_small)
    multi = _ids(spark, "sim_ivf_multiprobe", sf_small)
    rerank = _ids(spark, "sim_ivf_rerank", sf_small)
    assert len(rerank) == len(multi) == 10
    assert len(brute & rerank) <= len(brute & multi)
    # The surrogate stage keeps most of the exact top-k of the probed
    # set: majority overlap, not equality (that's the compute trade).
    assert len(rerank & multi) >= 5, (rerank, multi)


def test_hamming_shortlist_recall_beats_random(spark, sf_small):
    """1-bit Hamming ANN: the 50-vector shortlist (2.5% of the corpus
    at this sf) re-ranked by exact cosine recovers most of the
    brute-force top-10 — sign-bit Hamming distance is a usable angular
    surrogate (measured 0.8 at sf0.001 / 0.7 at sf0.01; a random 2.5%
    shortlist would land ~0.03). Floor pinned well below the measured
    value so the property, not the noise, is the assertion."""
    brute = _ids(spark, "sim_topk_brute", sf_small)
    ham = _ids(spark, "sim_hamming_topk", sf_small)
    assert len(ham) == 10
    assert len(brute & ham) / len(brute) >= 0.5


def test_absolute_recall_floors_sf001(spark, sf_medium):
    """Absolute recall@10 floors at sf0.01 (VERDICT r7 #6): the
    monotonicity tests above can't catch a silent recall COLLAPSE
    (e.g. a banding-parameter change that tanks every variant equally),
    so pin floors under the measured values. Measured at sf0.01 (round
    8): LSH multiprobe 0.6, IVF nprobe=3 0.4, Hamming shortlist 0.7 —
    consistent with SCALE.md's sf0.1 table (0.60 / 0.40 / 0.50). The
    queries are fully deterministic (md5-derived hashes, fixed probe
    budgets), so the margin below the measured value only absorbs
    corpus regeneration, not run-to-run noise."""
    brute = _ids(spark, "sim_topk_brute", sf_medium)
    assert len(brute) == 10
    floors = {
        "sim_lsh_multiprobe": 0.4,
        "sim_ivf_multiprobe": 0.25,
        "sim_hamming_topk": 0.5,
    }
    measured = {
        name: len(brute & _ids(spark, name, sf_medium)) / len(brute)
        for name in floors
    }
    for name, floor in floors.items():
        assert measured[name] >= floor, (name, measured[name], floor)


def test_retrained_index_recall_floor(spark, sf_medium):
    """The retrain must not tank serving quality: the refreshed-index
    serve (sim_ivf_retrain, IVF_NPROBE probes over the one-refresh
    centroids) keeps an absolute recall@10 floor vs brute force.
    Measured 1.0 at sf0.001 / 0.8 at sf0.01; floor pinned well below so
    the property — a retrain cannot collapse recall — is the assertion,
    not the noise. Deterministic queries, margin absorbs only corpus
    regeneration."""
    brute = _ids(spark, "sim_topk_brute", sf_medium)
    rt = _ids(spark, "sim_ivf_retrain", sf_medium)
    assert len(brute) == 10
    assert len(brute & rt) / len(brute) >= 0.5, (brute, rt)


def test_autotune_chosen_dial_meets_recall_floor(spark, sf_medium):
    """VERDICT r9 #4: the autotune's CHOSEN dial must actually deliver
    the recall floor it optimizes for (3/5 = 0.6) whenever any grid
    setting can — and must be the CHEAPEST such setting (a dearer
    qualifying dial being chosen means the selection rule broke).
    Measured at sf0.01: hamming widths 25/50 qualify (recall 0.6/0.7,
    width 25 chosen as cheapest) while the IVF grid tops out at 0.4 and
    exercises the fallback branch; the
    assertion is conditional per variant so hostile/small corpora that
    drive the fallback branch stay legal."""
    from dbt_bigquery_udf_spark.operators.similarity import (
        ANN_TUNE_FLOOR_DEN,
        ANN_TUNE_FLOOR_NUM,
    )

    rows = Q.QUERIES["sim_ann_autotune"](spark, sf_medium).collect()
    assert len(rows) == 6
    by_variant: dict[str, list] = {}
    for r in rows:
        by_variant.setdefault(r.variant, []).append(r)
    floor = ANN_TUNE_FLOOR_NUM / ANN_TUNE_FLOOR_DEN
    chose_any = False
    for variant, vrows in by_variant.items():
        picked = [r for r in vrows if r.chosen]
        assert len(picked) == 1, (variant, vrows)
        qualifying = [r for r in vrows if r.recall_at_k >= floor]
        if qualifying:
            chose_any = True
            best = min(qualifying, key=lambda r: (r.est_cost, r.dial))
            assert picked[0].dial == best.dial, (variant, picked, best)
            assert picked[0].recall_at_k >= floor
        else:
            # fallback: the chosen dial is the max-recall one
            assert picked[0].recall_at_k == max(
                r.recall_at_k for r in vrows
            ), (variant, vrows)
    # at sf0.01 at least one variant's grid genuinely reaches the floor
    assert chose_any
