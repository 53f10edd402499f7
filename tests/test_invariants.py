"""Semantic invariants for operators whose formula is implemented TWICE
(Spark + DuckDB oracle): an error copied into both sides passes every
parity check, so each of these ops also gets a property the formula
must satisfy regardless of implementation — the round-3 PageRank /N bug
(shared by both sides, caught only by the rank-sum invariant) is the
motivating case.
"""

from __future__ import annotations

import os

import pytest

from dbt_bigquery_udf_spark import queries as Q


@pytest.fixture(scope="module")
def crafted_docs_dir(tmp_path_factory, spark):
    """An sf-layout dir whose documents table has known structure:
    - doc 1: highly repetitive (one repeated transition)
    - doc 2: English-marker-dense, lang='en'
    - doc 3: non-English markers, lang='de'
    - doc 4: unique word soup (every transition novel)
    """
    root = tmp_path_factory.mktemp("crafted_sf")
    rows = [
        (1, "ping pong " * 30 + "ping", "en", "srcA", 0),
        (2, "the cat and the dog of the house went to the yard "
            "and the bird sat on the tree of the garden", "en", "srcA", 0),
        (3, "der hund und die katze und das haus und ein baum "
            "der die das und ein der die das und ein", "de", "srcB", 0),
        (4, "zeta omicron quill jasper vortex lumen crag fjord "
            "byte nymph oxide plume rivet slate tundra umbra", "en", "srcB", 0),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src, _ in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(root), "documents.parquet")
    )
    return str(root)


def test_bigram_lm_repetition_scores_low(spark, crafted_docs_dir):
    """Bigram NLL invariants: every score is positive (smoothing keeps
    p < 1), and a document of one repeated transition scores FAR lower
    per bigram than a document of all-novel transitions — the ordering
    the filter exists to produce."""
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll_sum_micro"])
        for r in Q.QUERIES["text_bigram_lm_nll"](spark, crafted_docs_dir).collect()
    }
    assert all(s > 0 for _, s in out.values())
    avg = {d: s / n for d, (n, s) in out.items()}
    assert avg[1] < avg[2] < avg[4], avg  # repetitive << mixed << all-novel


def test_dsir_targets_in_domain_docs(spark, crafted_docs_dir):
    """DSIR invariant: the mean importance weight of target-domain
    (lang='en') documents exceeds the out-of-domain mean — otherwise
    importance resampling would select AGAINST its own target. (Both
    engines share the formula; this pins its sign and direction.)"""
    rows = Q.QUERIES["dsir_importance_weights"](spark, crafted_docs_dir).collect()
    per_doc = {r["doc_id"]: r["logw_micro"] / r["n_feats"] for r in rows}
    en_mean = (per_doc[1] + per_doc[2] + per_doc[4]) / 3
    assert en_mean > per_doc[3], per_doc
    # the marker-dense English doc is more in-domain than the German one
    assert per_doc[2] > per_doc[3], per_doc


def test_mmr_first_pick_is_top1_and_ranks_are_dense(spark, sf_small):
    """MMR invariants: the first selection carries no diversity penalty
    so it MUST equal the plain cosine top-1; ranks are dense 1..k with
    distinct ids; scores are non-increasing in rank order is NOT
    required (MMR trades relevance for diversity), but the first score
    must be the maximum."""
    mmr = {r["rk"]: r for r in Q.QUERIES["emb_mmr_diversify"](spark, sf_small).collect()}
    top1 = Q.QUERIES["sim_topk_brute"](spark, sf_small).first()
    assert sorted(mmr) == list(range(1, 11))
    assert len({r["vec_id"] for r in mmr.values()}) == 10
    assert mmr[1]["vec_id"] == top1["vec_id"]
    assert mmr[1]["mmr_score_x10_micro"] == max(
        r["mmr_score_x10_micro"] for r in mmr.values()
    )


def test_pagerank_mass_conservation(spark, sf_small):
    """PageRank invariant (the round-3 catch): the rank vector sums to
    ~1 after every iteration — teleport mass + damped link mass
    conserve up to dangling-node leakage and micro-rounding."""
    rows = Q.QUERIES["graph_pagerank_converged"](spark, sf_small).collect()
    total = sum(r["rank_micro"] for r in rows) / 1e12
    assert 0.93 <= total <= 1.001, total  # dangling leakage only
    assert all(r["rank_micro"] > 0 for r in rows)


def test_bpe_pair_counts_conserve_totals(spark, sf_small):
    """BPE invariant: total pair occurrences == sum over words of
    count * (len-1) — pair generation over the vocab must account for
    every adjacent position exactly once."""
    from pyspark.sql import functions as F

    from dbt_bigquery_udf_spark.operators.text import _docs

    pairs = Q.QUERIES["bpe_pair_counts"](spark, sf_small)
    total_pairs = pairs.agg(F.sum("pair_count")).first()[0]
    expected = (
        _docs(spark, sf_small)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select((F.greatest(F.length("w") - 1, F.lit(0))).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert total_pairs == expected


def test_gopher_rules_signals_and_verdict(spark, crafted_docs_dir):
    """Crafted docs pin the gates: doc 1 ('ping pong'x30, no stopwords)
    fails on top NON-stopword share AND stopword presence; doc 2
    (stopword-dense English prose — 'the' is 7/22 of it, which a naive
    top-word gate would wrongly flag) passes because the repetition
    gate excludes stopwords; doc 4 (unique word soup, no stopwords)
    fails on stopword presence. The combined verdict must equal the
    conjunction of its own emitted signals — an inconsistency means the
    two were computed from different intermediate state."""
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_gopher_rules"](spark, crafted_docs_dir).collect()
    }
    assert not rows[1].passes and rows[1].top_word_frac > 0.3
    assert rows[2].passes and rows[2].has_stopword
    assert not rows[4].passes and not rows[4].has_stopword
    for r in rows.values():
        expected = (
            5 <= r.n_words
            and 2.0 <= r.mean_word_len <= 12.0
            and r.top_word_frac <= 0.30
            and r.has_stopword
            and r.symbol_word_ratio <= 0.10
            and r.dup_line_frac <= 0.30
            and r.bullet_line_frac <= 0.90
            and r.ellipsis_line_frac <= 0.30
        )
        assert r.passes == expected, r


def test_gopher_rules_line_gates_and_empty_docs(spark, tmp_path):
    """The round-6 gate breadth + the empty-doc contract: (a) an
    empty / whitespace-only doc is EMITTED with n_words=0, NULL
    mean_word_len, passes=false — not silently dropped; (b) a
    bullet-heavy listicle fails the bullet-line gate; (c) duplicated
    lines trip the duplicate-line gate; (d) symbol-spam ('#'/'…')
    trips the symbol-to-word ratio; (e) ellipsis-trailing lines trip
    the ellipsis gate. All while prose with the same structure
    passes."""
    rows_in = [
        (1, ""),  # empty
        (2, "   "),  # whitespace-only
        (3, "\n".join(f"- the item number {i} of note" for i in range(10))),
        (4, "the cat sat on a mat\n" * 8 + "and the dog slept well"),
        (5, "the price of # things # is # up # again # and # more #"),
        (6, "\n".join(f"the story part {i} trails off..." for i in range(5))),
        (7, "the quick brown fox jumps over a lazy dog near the river\n"
            "it then rests in the shade of an old oak tree"),
    ]
    root = str(tmp_path / "gopher_line_sf")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows_in],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_gopher_rules"](spark, root).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}, "empty docs must be emitted"
    for empty_id in (1, 2):
        r = rows[empty_id]
        assert r.n_words == 0 and r.mean_word_len is None
        assert r.passes is False
    assert rows[3].bullet_line_frac == 1.0 and not rows[3].passes
    assert rows[4].dup_line_frac > 0.30 and not rows[4].passes
    assert rows[5].symbol_word_ratio > 0.10 and not rows[5].passes
    assert rows[6].ellipsis_line_frac == 1.0 and not rows[6].passes
    assert rows[7].passes


def test_shingle_fraction_bounds_and_self_novelty(spark, crafted_docs_dir):
    """dup_frac must lie in [0, 1] with n_dup_shingles <= n_shingles;
    doc 4 (every word unique corpus-wide) must have dup_frac = 0 — its
    shingles cannot appear in any other document."""
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["dedup_shingle_fraction"](spark, crafted_docs_dir).collect()
    }
    for r in rows.values():
        assert 0 <= r.n_dup_shingles <= r.n_shingles, r
        assert 0.0 <= r.dup_frac <= 1.0, r
    assert rows[4].dup_frac == 0.0


def test_cluster_stats_conserve_rows(spark, sf_small):
    """Conservation: sum(cluster_size * n_clusters) over the histogram
    must equal the document count exactly — every row belongs to
    exactly one exact-hash cluster (the invariant a shared off-by-one
    in both engines would break)."""
    from dbt_bigquery_udf_spark.sources.registry import register_sources

    hist = Q.QUERIES["dedup_cluster_stats"](spark, sf_small).collect()
    total = sum(r.rows_covered for r in hist)
    docs = register_sources(spark, sf_small, tables=("documents",))["documents"]
    assert total == docs.count()
    for r in hist:
        assert r.rows_covered == r.cluster_size * r.n_clusters


def test_c4_rules_line_cleaning_and_page_gates(spark, tmp_path):
    """C4 semantics pinned on crafted pages: (1) only terminal-punct
    lines with >=5 words survive into clean_text; (2) <3 sentences
    fails the page; (3) 'lorem ipsum' and '{' each fail the page even
    when the line gates pass; (4) a clean 3-sentence page passes and
    its clean_text drops exactly the junk lines."""
    rows_in = [
        (1, "The quick brown fox jumps over the dog.\n"
            "menu home about\n"
            "It then rests in the shade of an oak tree.\n"
            "The river nearby flows quietly to the sea."),
        (2, "Short sentence here is fine today.\n"
            "Another good sentence follows right after this."),  # 2 sents
        (3, "Lorem ipsum dolor sit amet is placeholder text everyone.\n"
            "This real sentence would otherwise pass the line gate.\n"
            "And this one also passes the line gate fine.\n"
            "A third sentence keeps the count at three."),
        (4, "function f() { return 1; } is code noise.\n"
            "This real sentence would otherwise pass the gate.\n"
            "And this one also passes the line gate fine.\n"
            "A third sentence keeps the count at three."),
        (5, "too short.\nno punct line at all here today"),
    ]
    root = str(tmp_path / "c4_sf")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows_in],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_c4_rules"](spark, root).collect()
    }
    r1 = rows[1]
    assert r1.passes and r1.n_kept_lines == 3 and r1.n_lines == 4
    assert "menu home about" not in r1.clean_text
    assert r1.clean_text.count("\n") == 2  # exactly the 3 kept lines
    assert not rows[2].passes and rows[2].n_sentences == 2
    assert not rows[3].passes and rows[3].has_lorem
    assert not rows[4].passes and rows[4].has_brace
    r5 = rows[5]
    assert not r5.passes and r5.n_kept_lines == 0 and r5.clean_text == ""


def test_dsir_selection_bias_and_determinism(spark, sf_small):
    """Gumbel-top-k selection invariants: (a) deterministic — two runs
    return the identical doc set in identical order (the reproducible-
    subset property the noise hashing exists for); (b) biased toward
    the target — the mean per-feature log-weight of the selected docs
    exceeds the corpus mean (selection must favor its own scorer);
    (c) score consistency — every emitted score_micro equals the RAW
    log-weight plus that doc's deterministic md5-derived Gumbel noise,
    recomputed here in pure Python (±1 micro for the rounding ulp)."""
    import hashlib
    import math as _math

    rows1 = Q.QUERIES["dsir_select_topk"](spark, sf_small).collect()
    rows2 = Q.QUERIES["dsir_select_topk"](spark, sf_small).collect()
    assert [r.doc_id for r in rows1] == [r.doc_id for r in rows2]
    assert len(rows1) == 100
    w = {
        r.doc_id: r.logw_micro / (r.n_feats * 1e6)
        for r in Q.QUERIES["dsir_importance_weights"](spark, sf_small).collect()
    }
    sel_mean = sum(w[r.doc_id] for r in rows1) / len(rows1)
    all_mean = sum(w.values()) / len(w)
    assert sel_mean > all_mean, (sel_mean, all_mean)
    for r in rows1:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        g = -_math.log(-_math.log((h + 0.5) / 4294967296.0))
        want = _math.floor((r.logw_micro / 1e6 + g) * 1e6 + 0.5)
        assert abs(r.score_micro - want) <= 1, (r.doc_id, r.score_micro, want)


def test_knn_graph_mutual_edges_symmetric(spark, sf_small):
    """emb_knn_graph: every row has rank in [1, K]; each src has <= K
    neighbors with distinct contiguous ranks; and mutual=True edges come
    in (src,dst)/(dst,src) pairs that BOTH carry mutual=True — the
    symmetry downstream graph algorithms rely on."""
    from dbt_bigquery_udf_spark.operators.similarity import KNN_GRAPH_K
    from dbt_bigquery_udf_spark.queries import QUERIES

    rows = QUERIES["emb_knn_graph"](spark, sf_small).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    edge = {(r.src, r.dst): r for r in rows}
    for src, es in by_src.items():
        ranks = sorted(e.rk for e in es)
        assert ranks == list(range(1, len(es) + 1)), (src, ranks)
        assert len(es) <= KNN_GRAPH_K
    for (s, d), r in edge.items():
        want_mutual = (d, s) in edge
        assert r.mutual == want_mutual, (s, d, r.mutual)
        if r.mutual:
            assert edge[(d, s)].mutual


def test_containment_bounds_and_direction(spark, sf_small):
    """dedup_containment: each direction's ratio is n_common over its
    own side's set size, both in (0, 1], and n_common <= min(n_a, n_b);
    every emitted pair clears the threshold in at least one direction."""
    from dbt_bigquery_udf_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
    )
    from dbt_bigquery_udf_spark.queries import QUERIES

    rows = QUERIES["dedup_containment"](spark, sf_small).collect()
    assert rows, "fixture corpus should produce containment pairs"
    for r in rows:
        assert 0 < r.n_common <= min(r.n_a, r.n_b), r
        assert abs(r.c_ab - round(r.n_common / r.n_a, 4)) < 1e-9, r
        assert abs(r.c_ba - round(r.n_common / r.n_b, 4)) < 1e-9, r
        assert max(r.c_ab, r.c_ba) >= CONTAINMENT_THRESHOLD, r


def test_stream_gate_bounds_match_gopher():
    """stream_quality_gate keeps LOCAL copies of the Gopher bounds
    (importing operators.text at pipelines import time broke the
    worker-side import order for every mapInPandas query); this pin is
    the anti-drift coupling."""
    from dbt_bigquery_udf_spark.operators.text import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )
    from dbt_bigquery_udf_spark.streaming.pipelines import (
        STREAM_GATE_MAX_MWL_X10,
        STREAM_GATE_MAX_WORDS,
        STREAM_GATE_MIN_MWL_X10,
        STREAM_GATE_MIN_WORDS,
    )

    assert STREAM_GATE_MIN_WORDS == GOPHER_MIN_WORDS
    assert STREAM_GATE_MAX_WORDS == GOPHER_MAX_WORDS
    assert STREAM_GATE_MIN_MWL_X10 == int(GOPHER_MIN_MEAN_WORD_LEN * 10)
    assert STREAM_GATE_MAX_MWL_X10 == int(GOPHER_MAX_MEAN_WORD_LEN * 10)


def test_kmeans_train_inertia_monotone_and_conserving(spark, sf_small):
    """emb_kmeans_train: Lloyd's guarantees per-round total inertia is
    non-increasing (up to the documented 4-decimal centroid rounding),
    every round partitions the full corpus (n_vecs sums to the corpus
    size each round, all k clusters non-empty here), and round 1's
    summary equals the single-step operator's view of the same init —
    an implementation error copied into both engines (e.g. assigning
    against the NEW centroids) would break one of these even though
    parity stays green."""
    from dbt_bigquery_udf_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_TRAIN_ROUNDS,
    )
    from dbt_bigquery_udf_spark.queries import QUERIES
    from dbt_bigquery_udf_spark.sources.registry import register_sources

    rows = QUERIES["emb_kmeans_train"](spark, sf_small).collect()
    n_corpus = register_sources(spark, sf_small, tables=("embeddings",))[
        "embeddings"
    ].count()
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r.round, []).append(r)
    assert sorted(by_round) == list(range(1, KMEANS_TRAIN_ROUNDS + 1))
    inertias = []
    for rnd, rs in sorted(by_round.items()):
        assert sorted(r.cluster_id for r in rs) == list(range(KMEANS_K))
        assert sum(r.n_vecs for r in rs) == n_corpus
        inertias.append(sum(r.inertia_micros for r in rs))
    # 4-decimal centroid rounding can perturb inertia by at most
    # ~2*d*eps per vector; 1% slack is orders of magnitude above that.
    for prev, cur in zip(inertias, inertias[1:]):
        assert cur <= prev * 1.01, inertias

    step = {
        (r.cluster_id): (r.n_vecs, r.centroid_norm)
        for r in QUERIES["emb_kmeans_step"](spark, sf_small).collect()
    }
    for r in by_round[1]:
        assert step[r.cluster_id] == (r.n_vecs, r.centroid_norm)


def test_label_propagation_votes_consistent_with_graph(spark, sf_small):
    """emb_label_propagation: one row per src; n_seed_votes in
    [1, KNN_GRAPH_K]; the row set is exactly the srcs whose kNN
    neighborhood contains a seed; and the predicted label is the true
    argmax of the seed-neighbor vote tally recomputed from the graph —
    a tie-break or join error would pass oracle parity only if copied
    into both engines, which this recomputation catches."""
    from dbt_bigquery_udf_spark.operators.similarity import (
        KNN_GRAPH_K,
        LABEL_PROP_SEED_MOD,
    )
    from dbt_bigquery_udf_spark.queries import QUERIES
    from dbt_bigquery_udf_spark.sources.registry import register_sources

    pred = {
        r.vec_id: r
        for r in QUERIES["emb_label_propagation"](spark, sf_small).collect()
    }
    edges = QUERIES["emb_knn_graph"](spark, sf_small).collect()
    labels = {
        r.vec_id: r.label
        for r in register_sources(spark, sf_small, tables=("embeddings",))[
            "embeddings"
        ].collect()
    }
    tally: dict[int, dict[int, list]] = {}
    for e in edges:
        if e.dst % LABEL_PROP_SEED_MOD == 0:
            by_label = tally.setdefault(e.src, {})
            w, n = by_label.get(labels[e.dst], (0, 0))
            by_label[labels[e.dst]] = (w + round(e.cosine * 10000), n + 1)
    assert set(pred) == set(tally)
    for src, by_label in tally.items():
        r = pred[src]
        assert 1 <= r.n_seed_votes <= KNN_GRAPH_K
        want = min(
            by_label.items(), key=lambda kv: (-kv[1][0], kv[0])
        )
        assert (r.pred_label, r.vote_micro, r.n_seed_votes) == (
            want[0],
            want[1][0],
            want[1][1],
        ), (src, by_label, r)
        assert r.is_seed == (src % LABEL_PROP_SEED_MOD == 0)
        assert r.agrees == (r.pred_label == labels[src])


def test_kcenter_init_radius_monotone_and_valid(spark, sf_small):
    """emb_kcenter_init: the greedy farthest-point guarantee — the
    coverage-radius trajectory is strictly positive and NON-INCREASING
    (each new center can only shrink the farthest gap), centers are
    distinct, step 0 is the vec_id-0 seed, and step 1's distance equals
    the true max distance-to-seed recomputed in numpy."""
    import numpy as np

    from dbt_bigquery_udf_spark.queries import QUERIES
    from dbt_bigquery_udf_spark.sources.registry import register_sources

    rows = sorted(
        QUERIES["emb_kcenter_init"](spark, sf_small).collect(),
        key=lambda r: r.step,
    )
    assert rows[0].step == 0 and rows[0].vec_id == 0 and rows[0].dist_micro == 0
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    dists = [r.dist_micro for r in rows[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists

    emb = {
        int(r.vec_id): np.array([float(x) for x in r.embedding])
        for r in register_sources(spark, sf_small, tables=("embeddings",))[
            "embeddings"
        ].collect()
    }
    seed = emb[0]
    best = max(
        ((vid, round(float(np.sqrt(((v - seed) ** 2).sum())), 6))
         for vid, v in emb.items() if vid != 0),
        key=lambda t: (t[1], -t[0]),
    )
    assert (rows[1].vec_id, rows[1].dist_micro) == (
        best[0],
        int(round(best[1] * 1e6)),
    )


def test_incremental_near_gate_contract(spark, sf_small):
    """dedup_incremental_near: EVERY new-batch doc appears exactly once
    (the gate contract — no silent drops); matched_doc is always from
    the index split, never the batch; is_near_dup holds iff the best
    jaccard clears the threshold; and no-candidate docs carry NULL
    match with a false verdict."""
    from dbt_bigquery_udf_spark.operators.dedup import (
        INCR_NEAR_MOD,
        JACCARD_THRESHOLD,
    )
    from dbt_bigquery_udf_spark.queries import QUERIES
    from dbt_bigquery_udf_spark.sources.registry import register_sources

    rows = QUERIES["dedup_incremental_near"](spark, sf_small).collect()
    docs = register_sources(spark, sf_small, tables=("documents",))[
        "documents"
    ].select("doc_id").collect()
    new_ids = {r.doc_id for r in docs if r.doc_id % INCR_NEAR_MOD == 0}
    assert sorted(r.new_id for r in rows) == sorted(new_ids)
    for r in rows:
        assert r.new_id % INCR_NEAR_MOD == 0
        if r.matched_doc is None:
            assert r.jaccard is None and r.is_near_dup is False
        else:
            assert r.matched_doc % INCR_NEAR_MOD != 0
            assert r.is_near_dup == (r.jaccard >= JACCARD_THRESHOLD)


def test_bpe_checkpoint_parity(spark, sf_small):
    """Lineage checkpointing is a pure materialization choice: the merge
    table learned with checkpoint truncation (the default cadence, and a
    per-step cadence) is identical to the unbounded-lineage control."""
    from dbt_bigquery_udf_spark.operators import text as T

    base = T._bpe_base_vocab(spark, sf_small).persist()
    try:
        control, _ = T._learn_merges(base, checkpoint_every=0)
        default, _ = T._learn_merges(base)
        everystep, _ = T._learn_merges(base, checkpoint_every=1)
        assert control == default == everystep
        assert len(control) > 0
    finally:
        base.unpersist()
