"""Three-way checks for the quality gates: Spark and the DuckDB oracle
share SQL-shaped thinking, so a misconception copied into both passes
every parity check. These tests re-implement quality_gopher_rules and
quality_c4_rules in plain Python from the PUBLISHED rule definitions
(Rae et al. 2021 Table A1; Raffel et al. 2020 §2.2) and compare
row-by-row on a seeded randomized corpus that exercises empty docs,
stopword-only docs, newline structure, bullets, ellipses, symbols, and
unicode — one Spark job for the whole corpus, not one per example.
"""

from __future__ import annotations

import math
import os
import random
import re

import pytest

from dbt_bigquery_udf_spark import queries as Q
from dbt_bigquery_udf_spark.operators.text import (
    C4_MIN_LINE_WORDS,
    C4_MIN_SENTENCES,
    GOPHER_MAX_BULLET_FRAC,
    GOPHER_MAX_DUP_LINE_FRAC,
    GOPHER_MAX_ELLIPSIS_FRAC,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_TOP_WORD_FRAC,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
)

_WORDS = [
    "the", "a", "of", "and", "to", "cat", "dog", "tree", "run", "fast",
    "slow", "supercalifragilistic", "x", "héllo", "naïve", "data",
    # engine-identity edge cases: U+000B (Java \s but not RE2 \s) and
    # NBSP (Python str.split() whitespace, NOT engine whitespace) must
    # stay INSIDE a single word in all three implementations
    "a\x0bb", "c\xa0d",
]
_LINE_ENDS = ["", ".", "!", "?", '"', "...", "…"]
_LINE_STARTS = ["", "- ", "* ", "• ", "  "]


def _rand_line(rng: random.Random) -> str:
    n = rng.randint(0, 9)
    words = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.25:
        words.append("#" * rng.randint(1, 3))
    return (
        rng.choice(_LINE_STARTS)
        + " ".join(words)
        + rng.choice(_LINE_ENDS)
    )


def _rand_doc(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.05:
        return ""
    if kind < 0.1:
        return "   "
    lines = [_rand_line(rng) for _ in range(rng.randint(1, 6))]
    if rng.random() < 0.3:  # force duplicate lines
        lines += [lines[0]] * rng.randint(1, 2)
    if rng.random() < 0.1:
        lines.append("some Lorem Ipsum filler { maybe }")
    return "\n".join(lines)


@pytest.fixture(scope="module")
def random_corpus_dir(tmp_path_factory, spark):
    rng = random.Random(20260814)
    docs = [(i, _rand_doc(rng)) for i in range(200)]
    # mixed langs so DSIR's target (en) vs raw split is non-trivial
    langs = {i: ("en" if i % 3 else "de") for i, _ in docs}
    root = str(tmp_path_factory.mktemp("rand_quality_sf"))
    spark.createDataFrame(
        [(i, t, langs[i], "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return root, {"docs": dict(docs), "langs": langs}


def _tokens(text: str) -> list[str]:
    return [w for w in text.split(" ") if w != ""]


_ENGINE_TRIM = " "  # Spark/DuckDB trim/ltrim/rtrim strip SPACES only


def _lines(text: str) -> list[str]:
    return [l for l in text.split("\n") if l.strip(_ENGINE_TRIM) != ""]


def _py_gopher(text: str) -> dict:
    # Whitespace tokens, EXPLICIT class [ \t\n\f\r] — matches both
    # engines exactly; Python's bare split() would also split U+000B /
    # NBSP / U+2028 etc., which neither engine treats as whitespace.
    t = [w for w in re.split(r"[ \t\n\f\r]+", text) if w != ""]
    ls = _lines(text)
    n_words = len(t)
    mean_wl = sum(len(w) for w in t) / n_words if n_words else None
    non_stop = [w for w in t if w not in GOPHER_STOPWORDS]
    top_n = max((non_stop.count(w) for w in set(non_stop)), default=0)
    has_stop = any(w in GOPHER_STOPWORDS for w in t)
    n_sym = text.count("#") + text.count("…")
    n_lines = len(ls)
    n_dup = n_lines - len(set(ls))
    n_bullet = sum(
        1 for l in ls
        if l.lstrip(_ENGINE_TRIM).startswith(("-", "*", "•"))
    )
    n_ell = sum(
        1 for l in ls if l.rstrip(_ENGINE_TRIM).endswith(("...", "…"))
    )
    nl = max(n_lines, 1)
    nw = max(n_words, 1)
    passes = (
        GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS
        and mean_wl is not None
        and GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= GOPHER_MAX_MEAN_WORD_LEN
        and top_n / nw <= GOPHER_MAX_TOP_WORD_FRAC
        and has_stop
        and n_sym / nw <= GOPHER_MAX_SYMBOL_RATIO
        and n_dup / nl <= GOPHER_MAX_DUP_LINE_FRAC
        and n_bullet / nl <= GOPHER_MAX_BULLET_FRAC
        and n_ell / nl <= GOPHER_MAX_ELLIPSIS_FRAC
    )
    return {
        "n_words": n_words,
        "mean_word_len": round(mean_wl, 6) if mean_wl is not None else None,
        "top_word_frac": round(top_n / n_words, 6) if n_words else None,
        "has_stopword": has_stop,
        "symbol_word_ratio": round(n_sym / nw, 6),
        "dup_line_frac": round(n_dup / nl, 6),
        "bullet_line_frac": round(n_bullet / nl, 6),
        "ellipsis_line_frac": round(n_ell / nl, 6),
        "passes": passes,
    }


def _py_c4(text: str) -> dict:
    ls = _lines(text)
    kept = [
        l for l in ls
        if l.rstrip(_ENGINE_TRIM).endswith((".", "!", "?", '"'))
        and len(_tokens(l)) >= C4_MIN_LINE_WORDS
    ]
    clean = "\n".join(kept)
    n_sent = clean.count(".") + clean.count("!") + clean.count("?")
    has_lorem = "lorem ipsum" in text.lower()
    has_brace = "{" in text
    return {
        "n_lines": len(ls),
        "n_kept_lines": len(kept),
        "kept_line_frac": round(len(kept) / max(len(ls), 1), 6),
        "n_sentences": n_sent,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "clean_text": clean,
        "passes": (
            n_sent >= C4_MIN_SENTENCES and not has_lorem and not has_brace
        ),
    }


def _approx(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-9)
    return a == b


def test_gopher_matches_python_reference(spark, random_corpus_dir):
    root, bundle = random_corpus_dir
    docs = bundle["docs"]
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_gopher_rules"](spark, root).collect()
    }
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        want = _py_gopher(text)
        got = rows[doc_id]
        for k, v in want.items():
            assert _approx(getattr(got, k), v), (doc_id, k, getattr(got, k), v, repr(text))


def test_c4_matches_python_reference(spark, random_corpus_dir):
    root, bundle = random_corpus_dir
    docs = bundle["docs"]
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_c4_rules"](spark, root).collect()
    }
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        want = _py_c4(text)
        got = rows[doc_id]
        for k, v in want.items():
            assert _approx(getattr(got, k), v), (doc_id, k, getattr(got, k), v, repr(text))


def test_shingle_fraction_matches_python_reference(spark, random_corpus_dir):
    """Three-way check for dedup_shingle_fraction: pure-Python distinct
    5-gram shingles + cross-document document-frequency — also
    validates that the round-6 xxhash64 key optimization changed keys,
    not counts."""
    from dbt_bigquery_udf_spark.operators.text import DUP_SHINGLE_N

    root, bundle = random_corpus_dir
    docs = bundle["docs"]
    sh_by_doc = {}
    for doc_id, text in docs.items():
        t = [w for w in text.split(" ") if w != ""]
        sh_by_doc[doc_id] = {
            " ".join(t[i : i + DUP_SHINGLE_N])
            for i in range(len(t) - DUP_SHINGLE_N + 1)
        }
    df_count = {}
    for shingles in sh_by_doc.values():
        for s in shingles:
            df_count[s] = df_count.get(s, 0) + 1
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["dedup_shingle_fraction"](spark, root).collect()
    }
    expect_ids = {d for d, s in sh_by_doc.items() if s}
    assert set(rows) == expect_ids
    for doc_id in expect_ids:
        n = len(sh_by_doc[doc_id])
        dup = sum(1 for s in sh_by_doc[doc_id] if df_count[s] > 1)
        r = rows[doc_id]
        assert r.n_shingles == n, (doc_id, r.n_shingles, n)
        assert r.n_dup_shingles == dup, (doc_id, r.n_dup_shingles, dup)
        assert _approx(r.dup_frac, round(dup / n, 6)), (doc_id, r.dup_frac)


def test_bigram_nll_matches_python_reference(spark, random_corpus_dir):
    """Three-way check for text_bigram_lm_nll: pure-Python add-one
    bigram LM (corpus pair counts, per-context totals, |V| from
    distinct second words) — the conventions (which side of the pair
    defines V, whether counts are token- or type-level) are exactly
    the kind of shared-misconception risk oracle parity can't see."""
    root, bundle = random_corpus_dir
    docs = bundle["docs"]
    per_doc_bigrams = {}
    pair_n: dict[str, int] = {}
    for doc_id, text in docs.items():
        t = [w for w in text.lower().strip().split(" ") if w != ""]
        bgs = [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        if bgs:
            per_doc_bigrams[doc_id] = bgs
        for b in set(bgs):
            pair_n[b] = pair_n.get(b, 0) + sum(1 for x in bgs if x == b)
    ctx_n: dict[str, int] = {}
    seconds = set()
    for b, n in pair_n.items():
        w1, w2 = b.split(" ")
        ctx_n[w1] = ctx_n.get(w1, 0) + n
        seconds.add(w2)
    v = len(seconds)
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["text_bigram_lm_nll"](spark, root).collect()
    }
    assert set(rows) == set(per_doc_bigrams)
    for doc_id, bgs in per_doc_bigrams.items():
        want_sum = 0
        for b in bgs:
            w1 = b.split(" ")[0]
            p = (pair_n[b] + 1.0) / (ctx_n[w1] + v)
            want_sum += math.floor(-math.log(p) * 1_000_000 + 0.5)
        r = rows[doc_id]
        assert r.n_bigrams == len(bgs), (doc_id, r.n_bigrams, len(bgs))
        assert r.nll_sum_micro == want_sum, (doc_id, r.nll_sum_micro, want_sum)


def test_dsir_weights_match_python_reference(spark, random_corpus_dir):
    """Three-way check for dsir_importance_weights: pure-Python hashed
    unigram+bigram features, Laplace-smoothed bucket log-ratios in
    integer micro-units — the bucket-hash convention, token- (not
    type-) level counting, and smoothing constants are all pinned
    against an implementation that shares nothing with SQL. Exact
    integer equality expected: the micro-unit terms make the per-doc
    sums order-free, and Python/JVM/DuckDB ln agree bitwise on
    identical doubles (see parity notes); a genuine half-boundary ulp
    would show up as an n_feats-bounded drift, so the assertion allows
    +-1 micro per feature before failing."""
    import hashlib

    from dbt_bigquery_udf_spark.operators.text import (
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
    )

    root, bundle = random_corpus_dir
    docs, langs = bundle["docs"], bundle["langs"]
    doc_grams = {}
    ct = [0] * DSIR_BUCKETS
    cr = [0] * DSIR_BUCKETS

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    for doc_id, text in docs.items():
        t = [w for w in text.split(" ") if w != ""]
        grams = t + [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        if not grams:
            continue
        bs = [bucket(g) for g in grams]
        doc_grams[doc_id] = bs
        is_target = langs[doc_id] == DSIR_TARGET_LANG
        for b in bs:
            cr[b] += 1
            if is_target:
                ct[b] += 1
    tt, tr = sum(ct), sum(cr)
    term = {}
    for b in range(DSIR_BUCKETS):
        if cr[b] == 0:
            continue
        p = ((ct[b] + 1.0) / (tt + DSIR_BUCKETS)) / (
            (cr[b] + 1.0) / (tr + DSIR_BUCKETS)
        )
        term[b] = math.floor(math.log(p) * 1_000_000 + 0.5)
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["dsir_importance_weights"](spark, root).collect()
    }
    assert set(rows) == set(doc_grams)
    for doc_id, bs in doc_grams.items():
        r = rows[doc_id]
        assert r.n_feats == len(bs), (doc_id, r.n_feats, len(bs))
        want = sum(term[b] for b in bs)
        assert abs(r.logw_micro - want) <= len(bs), (
            doc_id, r.logw_micro, want
        )


def test_brute_topk_matches_numpy_reference(spark, sf_small):
    """Three-way check for sim_topk_brute: exact cosine top-10 computed
    with numpy over the raw embeddings parquet — pins the dot-product /
    norm conventions and the (rounded score DESC, vec_id) tie-break
    against an implementation that shares nothing with either SQL
    engine."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbt_bigquery_udf_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOP_K,
    )

    tbl = pq.read_table(os.path.join(sf_small, "embeddings.parquet"))
    ids = np.asarray(tbl["vec_id"])
    embs = np.array([np.asarray(v) for v in tbl["embedding"].to_pylist()],
                    dtype=np.float64)
    q = embs[ids == QUERY_VEC_ID][0]
    mask = ids != QUERY_VEC_ID
    cand_ids, cand = ids[mask], embs[mask]
    cos = cand @ q / (np.linalg.norm(cand, axis=1) * np.linalg.norm(q))
    cos = np.round(cos, 4)
    order = sorted(range(len(cand_ids)), key=lambda i: (-cos[i], cand_ids[i]))
    want = [(int(cand_ids[i]), float(cos[i])) for i in order[:TOP_K]]
    got = [
        (r.vec_id, r.cosine)
        for r in Q.QUERIES["sim_topk_brute"](spark, sf_small).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want], (got, want)
    for (gi, gc), (wi, wc) in zip(got, want):
        assert _approx(gc, wc), (gi, gc, wc)


def test_hamming_topk_matches_numpy_reference(spark, sf_small):
    """Three-way check for sim_hamming_topk: numpy sign-bit Hamming
    shortlist (50, tie-break vec_id) then exact-cosine re-rank — pins
    the two-stage boundary (which vectors make the shortlist) and the
    sign convention (x > 0, zeros negative) end to end."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbt_bigquery_udf_spark.operators.similarity import (
        HAMMING_SHORTLIST,
        QUERY_VEC_ID,
        TOP_K,
    )

    tbl = pq.read_table(os.path.join(sf_small, "embeddings.parquet"))
    ids = np.asarray(tbl["vec_id"])
    embs = np.array([np.asarray(v) for v in tbl["embedding"].to_pylist()],
                    dtype=np.float64)
    q = embs[ids == QUERY_VEC_ID][0]
    mask = ids != QUERY_VEC_ID
    cand_ids, cand = ids[mask], embs[mask]
    ham = ((cand > 0) != (q > 0)).sum(axis=1)
    short = sorted(range(len(cand_ids)), key=lambda i: (ham[i], cand_ids[i]))
    short = short[:HAMMING_SHORTLIST]
    cos = {
        i: round(
            float(cand[i] @ q
                  / (np.linalg.norm(cand[i]) * np.linalg.norm(q))), 4)
        for i in short
    }
    order = sorted(short, key=lambda i: (-cos[i], cand_ids[i]))[:TOP_K]
    want = [(int(cand_ids[i]), int(ham[i]), cos[i]) for i in order]
    got = [
        (r.vec_id, r.hamming, r.cosine)
        for r in Q.QUERIES["sim_hamming_topk"](spark, sf_small).collect()
    ]
    assert [g[:2] for g in got] == [w[:2] for w in want], (got, want)
    for g, w in zip(got, want):
        assert _approx(g[2], w[2]), (g, w)


def test_perplexity_proxy_matches_python_reference(spark, random_corpus_dir):
    """Three-way check for text_perplexity_proxy: pure-Python corpus
    unigram distribution + per-token micro-unit NLL terms — pins the
    token-level (not type-level) expectation and the lowercase/trim
    tokenization."""
    root, bundle = random_corpus_dir
    docs = bundle["docs"]
    uni: dict[str, int] = {}
    doc_toks = {}
    for doc_id, text in docs.items():
        t = [w for w in text.lower().strip().split(" ") if w != ""]
        if t:
            doc_toks[doc_id] = t
        for w in t:
            uni[w] = uni.get(w, 0) + 1
    big_n = sum(uni.values())
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["text_perplexity_proxy"](spark, root).collect()
    }
    assert set(rows) == set(doc_toks)
    for doc_id, t in doc_toks.items():
        terms = [
            math.floor(-math.log(uni[w] / big_n) * 1_000_000 + 0.5)
            for w in t
        ]
        r = rows[doc_id]
        assert r.n_tokens == len(t), (doc_id, r.n_tokens, len(t))
        want = round(sum(terms) / (len(t) * 1e6), 4)
        assert _approx(r.avg_nll, want), (doc_id, r.avg_nll, want)


def test_range_search_matches_numpy_reference(spark, sf_small):
    """Three-way check for sim_range_search: numpy cosine radius query —
    pins the threshold-on-ROUNDED-score convention, the self-exclusion,
    and the query-batch membership against an implementation that
    shares nothing with either SQL engine."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbt_bigquery_udf_spark.operators.similarity import (
        RANGE_COS_TAU,
        RANGE_QUERY_IDS,
    )

    tbl = pq.read_table(os.path.join(sf_small, "embeddings.parquet"))
    ids = np.asarray(tbl["vec_id"])
    embs = np.array([np.asarray(v) for v in tbl["embedding"].to_pylist()],
                    dtype=np.float64)
    want: dict[tuple[int, int], float] = {}
    for qid in RANGE_QUERY_IDS:
        q = embs[ids == qid][0]
        cos = np.round(
            embs @ q / (np.linalg.norm(embs, axis=1) * np.linalg.norm(q)), 4
        )
        for vid, c in zip(ids, cos):
            if int(vid) != qid and c >= RANGE_COS_TAU:
                want[(qid, int(vid))] = float(c)
    got = {
        (r.query_id, r.vec_id): r.cosine
        for r in Q.QUERIES["sim_range_search"](spark, sf_small).collect()
    }
    assert set(got) == set(want), (
        set(got) - set(want), set(want) - set(got))
    for k, v in want.items():
        assert _approx(got[k], v), (k, got[k], v)


@pytest.fixture(scope="module")
def block_corpus_dir(tmp_path_factory, spark):
    """Corpus crafted for block-level dedup: a fixed 16-token boilerplate
    header shared by ~40% of docs (block-ALIGNED duplicates), the same
    phrase inserted mid-document elsewhere (misaligned — block
    granularity must MISS these, a documented limitation vs true suffix
    arrays), verbatim full-document copies, double spaces, newlines
    inside the text, and empty / whitespace-only docs. All docs < 128
    tokens so round(x, 6) never lands on a half-boundary (Python
    banker's rounding vs engine half-up would differ there)."""
    rng = random.Random(20260815)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    boiler = " ".join(
        ["terms", "of", "service", "all", "rights", "reserved", "contact",
         "us", "at", "example", "dot", "com", "for", "more", "info", "now"]
    )  # exactly 16 tokens
    docs: list[tuple[int, str]] = []
    for i in range(120):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 80)))
        r = rng.random()
        if r < 0.4:
            text = boiler + " " + body          # aligned: block 0 duplicated
        elif r < 0.5:
            cut = rng.randint(1, 4)
            pre = " ".join(rng.choice(vocab) for _ in range(cut))
            text = pre + " " + boiler + " " + body   # misaligned copy
        else:
            text = body
        if rng.random() < 0.08:
            text = text.replace(" ", "  ", 2)   # double spaces -> empty toks
        if rng.random() < 0.1 and " " in text:
            k = text.find(" ", len(text) // 2)
            text = text[:k] + "\n" + text[k + 1:]  # newline INSIDE a token
        docs.append((i, text))
    docs.append((200, docs[0][1]))  # verbatim full-document copy
    docs.append((201, ""))
    docs.append((202, "   "))
    root = str(tmp_path_factory.mktemp("rand_block_sf"))
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return root, dict(docs)


def test_block_removal_matches_python_reference(spark, block_corpus_dir):
    """Three-way check for dedup_block_removal: plain-Python block
    dedup (space-split tokens, consecutive 16-token blocks, drop blocks
    in >= 2 distinct docs, reassemble) — pins block alignment, the
    distinct-DOC (not occurrence) dup criterion, partial-final-block
    token accounting, and the empty-doc n_blocks=0 contract."""
    from dbt_bigquery_udf_spark.operators.text import DEDUP_BLOCK_TOKENS

    root, docs = block_corpus_dir
    B = DEDUP_BLOCK_TOKENS
    toks = {
        i: [w for w in t.strip(" ").split(" ") if w != ""]
        for i, t in docs.items()
    }
    blocks = {
        i: [" ".join(ts[o:o + B]) for o in range(0, len(ts), B)]
        for i, ts in toks.items()
    }
    owners: dict[str, set[int]] = {}
    for i, bs in blocks.items():
        for b in bs:
            owners.setdefault(b, set()).add(i)
    rows = {r.doc_id: r for r in
            Q.QUERIES["dedup_block_removal"](spark, root).collect()}
    assert set(rows) == set(docs)
    for i, ts in toks.items():
        bs = blocks[i]
        dup = [len(owners[b]) >= 2 for b in bs]
        kept = [b for b, d in zip(bs, dup) if not d]
        n_rm_tok = sum(len(b.split(" ")) for b, d in zip(bs, dup) if d)
        got = rows[i]
        assert got.n_tokens == len(ts), (i, got)
        assert got.n_blocks == len(bs), (i, got)
        assert got.n_removed_blocks == sum(dup), (i, got)
        assert got.n_removed_tokens == n_rm_tok, (i, got)
        assert _approx(
            got.removed_frac, round(n_rm_tok / max(len(ts), 1), 6)
        ), (i, got)
        assert got.clean_text == " ".join(kept), (i, repr(got.clean_text))


def test_bpe_merges_match_python_reference(spark, random_corpus_dir):
    """Three-way check for bpe_train_merges: classic tuple-based BPE
    (Sennrich et al. 2016) in plain Python — pair counts weighted by
    word frequency, (count DESC, a, b) tie-break, left-greedy
    non-overlapping merge application. Proves the '||'-delimited
    replace() encoding used by BOTH engines is byte-equivalent to real
    BPE state transitions, on a corpus with newlines, unicode, U+000B
    and NBSP inside words."""
    from collections import Counter

    from dbt_bigquery_udf_spark.operators.text import BPE_MERGE_STEPS

    root, meta = random_corpus_dir
    vocab: Counter[str] = Counter()
    for text in meta["docs"].values():
        for w in re.split(r"[ \t\n\f\r]", text.lower().strip(" ")):
            if w != "" and "|" not in w:
                vocab[w] += 1
    states: dict[str, tuple[str, ...]] = {w: tuple(w) for w in vocab}
    want: list[tuple[int, str, str, str, int]] = []
    for step in range(1, BPE_MERGE_STEPS + 1):
        counts: Counter[tuple[str, str]] = Counter()
        for w, f in vocab.items():
            t = states[w]
            for j in range(len(t) - 1):
                counts[(t[j], t[j + 1])] += f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, a, b, a + b, cnt))
        for w, t in states.items():
            out: list[str] = []
            j = 0
            while j < len(t):
                if j + 1 < len(t) and t[j] == a and t[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(t[j])
                    j += 1
            states[w] = tuple(out)
    got = [
        (r.step, r.a, r.b, r.merged, r.cnt)
        for r in Q.QUERIES["bpe_train_merges"](spark, root).collect()
    ]
    assert got == want, (got, want)


def test_bpe_merges_learn_f_pairs(spark, tmp_path):
    """Regression for the Spark SQL-unescaper \\f trap: Spark's string
    unescaper has no case for \\f, so a two-backslash whitespace class
    reaches the regex engine as '[ \\t\\nf\\r]' and silently splits
    words on the LETTER 'f' — no f-containing merge could ever be
    learned, while the DuckDB oracle (raw-string regex) behaved
    correctly. This corpus FORCES ('o','f') to win step 1, and the
    oracle comparison plus the form-feed word pin make any per-engine
    tokenization drift loud."""
    import duckdb

    from dbt_bigquery_udf_spark.queries import ORACLES

    root = str(tmp_path / "fcorpus")
    text = "of of of of fun fun for for info off\x0cofficial"
    spark.createDataFrame(
        [(1, text, "en", "src", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    got = [
        (r.step, r.a, r.b, r.merged, r.cnt)
        for r in Q.QUERIES["bpe_train_merges"](spark, root).collect()
    ]
    # ('o','f') occurrences: of x4 + off + official (the form feed
    # separates off/official into two words) = 6 -> must win step 1
    assert got[0][1:] == ("o", "f", "of", 6), got
    assert any("f" in a or "f" in b for _, a, b, _, _ in got[1:]), got
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(root, 'documents.parquet', '*.parquet')}'"
    )
    want = [tuple(r) for r in con.execute(ORACLES["bpe_train_merges"]).fetchall()]
    assert got == want, (got, want)


def test_containment_matches_python_reference(spark, sf_small):
    """Three-way check replicating the ENTIRE MinHash-LSH stack in plain
    Python — shingles, md5-prefix base hashes, the 16-member universal
    hash family, banding, candidate generation — then Broder containment
    on the candidate pairs. Every stage is integer math, so the match is
    exact; this is the first non-SQL check of the banding pipeline
    itself (dedup_minhash_* previously had only Spark<->DuckDB parity).
    """
    import hashlib

    import pyarrow.parquet as pq

    from dbt_bigquery_udf_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
    )

    tbl = pq.read_table(os.path.join(sf_small, "documents.parquet"))
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    hs: dict[int, set[int]] = {}
    sigs: dict[int, list[int]] = {}
    for i, t in docs.items():
        words = t.strip(" ").lower().split(" ")
        sh = {
            " ".join(words[j:j + 3])
            for j in range(max(len(words) - 2, 1))
        }
        xs = {
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh
        }
        if not xs:
            continue
        hs[i] = xs
        sigs[i] = [
            min((a * x + b) % MINHASH_P for x in xs)
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for b in range(N_BANDS):
            key = ":".join(
                str(sig[b * ROWS_PER_BAND + r]) for r in range(ROWS_PER_BAND)
            )
            buckets.setdefault((b, key), []).append(i)
    cand = set()
    for members in buckets.values():
        for x in members:
            for y in members:
                if x < y:
                    cand.add((x, y))
    want = {}
    for a, b in cand:
        inter = len(hs[a] & hs[b])
        c_ab = round(inter / len(hs[a]), 4)
        c_ba = round(inter / len(hs[b]), 4)
        if max(c_ab, c_ba) >= CONTAINMENT_THRESHOLD:
            want[(a, b)] = (inter, len(hs[a]), len(hs[b]), c_ab, c_ba)
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_a, r.n_b, r.c_ab, r.c_ba)
        for r in Q.QUERIES["dedup_containment"](spark, sf_small).collect()
    }
    assert set(got) == set(want), (set(got) ^ set(want))
    for k, w in want.items():
        g = got[k]
        assert g[:3] == w[:3], (k, g, w)
        assert _approx(g[3], w[3]) and _approx(g[4], w[4]), (k, g, w)


def test_knn_graph_matches_numpy_reference(spark, sf_small):
    """Three-way check for emb_knn_graph replicating the cluster
    assignment's integer-encoded argmin (left-to-right fold, half-up
    micro rounding), the within-cell rounded-cosine ranking, and the
    mutual flags in plain Python/numpy."""
    import math

    import pyarrow.parquet as pq

    from dbt_bigquery_udf_spark.operators.dedup import semdedup_k
    from dbt_bigquery_udf_spark.operators.similarity import KNN_GRAPH_K

    tbl = pq.read_table(os.path.join(sf_small, "embeddings.parquet"))
    ids = tbl["vec_id"].to_pylist()
    embs = {
        int(i): [float(x) for x in v]
        for i, v in zip(ids, tbl["embedding"].to_pylist())
    }
    k = semdedup_k(len(embs))

    def l2r_sum(terms):  # left-to-right fold == the codegen'd sum
        s = 0.0
        for t in terms:
            s = s + t
        return s

    def half_up(x, d):
        # Spark/DuckDB round() = half AWAY FROM ZERO (Python round is
        # banker's; floor(x+0.5) alone would be half-toward-+inf, wrong
        # for negative cosines at exact .5 boundaries)
        scale = 10 ** d
        return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale

    cents = {i: v for i, v in embs.items() if i < k}
    cluster = {}
    for i, v in embs.items():
        best = None
        for cid, c in sorted(cents.items()):
            dist = math.sqrt(
                l2r_sum((a - b) * (a - b) for a, b in zip(v, c))
            )
            enc = int(math.floor(dist * 1e6 + 0.5)) * 100000 + cid
            best = enc if best is None else min(best, enc)
        cluster[i] = best % 100000
    nrm = {
        i: math.sqrt(l2r_sum(x * x for x in v)) for i, v in embs.items()
    }
    want = {}
    for i in embs:
        peers = [j for j in embs if j != i and cluster[j] == cluster[i]]
        scored = sorted(
            (
                (
                    -half_up(
                        l2r_sum(a * b for a, b in zip(embs[i], embs[j]))
                        / (nrm[i] * nrm[j]),
                        4,
                    ),
                    j,
                )
                for j in peers
            )
        )[:KNN_GRAPH_K]
        for rk, (negcos, j) in enumerate(scored, start=1):
            want[(i, j)] = (cluster[i], rk, -negcos)
    got = {
        (r.src, r.dst): (r.cluster_id, r.rk, r.cosine, r.mutual)
        for r in Q.QUERIES["emb_knn_graph"](spark, sf_small).collect()
    }
    assert set(got) == set(want), (set(got) ^ set(want))
    for key, (cid, rk, cos) in want.items():
        g = got[key]
        assert g[0] == cid and g[1] == rk, (key, g, (cid, rk, cos))
        assert _approx(g[2], cos), (key, g[2], cos)
        assert g[3] == ((key[1], key[0]) in want), (key, g)


def test_classifier_score_matches_python_reference(spark, random_corpus_dir):
    """Three-way check for quality_classifier_score: hashlib md5
    feature hashing, integer weights, bigram construction, and the
    empty-doc n_feats=0/passes=false contract replicated in plain
    Python."""
    import hashlib

    from dbt_bigquery_udf_spark.operators.text import (
        CLS_BUCKETS,
        CLS_W_SPAN,
    )

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    root, meta = random_corpus_dir
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["quality_classifier_score"](spark, root).collect()
    }
    assert set(rows) == set(meta["docs"])
    for doc_id, text in meta["docs"].items():
        t = [w for w in text.strip(" ").lower().split(" ") if w != ""]
        feats = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        logit = sum(
            (h32(str(h32(f) % CLS_BUCKETS)) % CLS_W_SPAN) - 10000
            for f in feats
        )
        got = rows[doc_id]
        assert got.n_feats == len(feats), (doc_id, got)
        assert got.logit_q == (logit if feats else 0), (doc_id, got)
        assert _approx(
            got.mean_w,
            round((logit if feats else 0) / (max(len(feats), 1) * 10000.0), 6),
        ), (doc_id, got)
        assert got.passes == (len(feats) > 0 and logit >= 0), (doc_id, got)


def test_bpe_encode_matches_python_reference(spark, random_corpus_dir):
    """Three-way check for bpe_encode_corpus: train true tuple-based
    BPE in Python (as in test_bpe_merges_match_python_reference), then
    encode every document with the learned states and compare token /
    char counts — pins the train->encode consistency, the '|'-word
    exclusion, and the empty-doc zero-row contract."""
    from collections import Counter

    from dbt_bigquery_udf_spark.operators.text import BPE_MERGE_STEPS

    root, meta = random_corpus_dir

    def words_of(text: str) -> list[str]:
        return [
            w
            for w in re.split(r"[ \t\n\f\r]", text.lower().strip(" "))
            if w != "" and "|" not in w
        ]

    vocab: Counter[str] = Counter()
    for text in meta["docs"].values():
        vocab.update(words_of(text))
    states: dict[str, tuple[str, ...]] = {w: tuple(w) for w in vocab}
    for _ in range(BPE_MERGE_STEPS):
        counts: Counter[tuple[str, str]] = Counter()
        for w, f in vocab.items():
            t = states[w]
            for j in range(len(t) - 1):
                counts[(t[j], t[j + 1])] += f
        if not counts:
            break
        (a, b), _cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, t in states.items():
            out: list[str] = []
            j = 0
            while j < len(t):
                if j + 1 < len(t) and t[j] == a and t[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(t[j])
                    j += 1
            states[w] = tuple(out)
    rows = {
        r.doc_id: r
        for r in Q.QUERIES["bpe_encode_corpus"](spark, root).collect()
    }
    assert set(rows) == set(meta["docs"])
    for doc_id, text in meta["docs"].items():
        ws = words_of(text)
        n_tok = sum(len(states[w]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        got = rows[doc_id]
        assert got.n_words == len(ws), (doc_id, got)
        assert got.n_bpe_tokens == n_tok, (doc_id, got, repr(text))
        assert got.n_chars == n_chars, (doc_id, got)
        # engine round() is half-away-from-zero; Python round is
        # banker's, and dyadic ratios DO land on exact halves here
        # (37/32 = 1.15625 -> engines 1.1563, Python round 1.1562)
        want_cpt = math.floor(n_chars / max(n_tok, 1) * 1e4 + 0.5) / 1e4
        assert _approx(got.chars_per_token, want_cpt), (doc_id, got)
