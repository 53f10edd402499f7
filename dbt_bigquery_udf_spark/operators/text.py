"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting).

All heavy lifting stays JVM-side in built-in functions (split,
regexp_extract_all, transform/aggregate over arrays, md5) — no Python
UDFs in any hot path. Every operator has an exact DuckDB oracle: hash
functions are md5 (bit-identical across engines) and ratios are rounded
before comparison.

Scale notes: every query here is embarrassingly parallel per document
(narrow transformations, no shuffle except final aggregates), so 100 TB
throughput is bounded by parquet scan + codegen — the ideal shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..queries import register
from .util import ensure_min_partitions, local_rows_df
from ..sources.registry import register_sources

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible on both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "des"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("的", "是", "了", "我", "不"),
}

_STOPWORDS = LANG_MARKERS["en"]

# A BPE-ish tokenizer regex: words, numbers, or single punctuation —
# the standard pre-tokenization shape (letters/digits/other classes).
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_sources(spark, sf_dir, tables=("documents",))["documents"]


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS type_token_ratio,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, type-token
    ratio, and a BPE-ish regex token count."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks), 4
        ).alias("type_token_ratio"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        "n_chars",
    )


def _stopword_hits_sql_duckdb() -> str:
    return (
        "len(list_filter(string_split(text, ' '), t -> t IN ("
        + ", ".join(f"'{w}'" for w in _STOPWORDS)
        + ")))"
    )


@register(
    "text_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             {_stopword_hits_sql_duckdb()} AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS mean_token_len,
           round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
           CASE WHEN n_tokens >= 20
                 AND CAST(stop_hits AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
                THEN 1 ELSE 0 END AS quality_pass
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword
    ratio, and a pass/fail gate — the C4-style filter shape."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_tokens = F.size(toks)
    ratio = stop_hits * F.lit(1.0) / n_tokens
    return d.select(
        "doc_id",
        F.round(F.col("n_chars") * F.lit(1.0) / n_tokens, 4).alias("mean_token_len"),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.when((n_tokens >= 20) & ratio.between(0.01, 0.5), 1)
        .otherwise(0)
        .alias("quality_pass"),
    )


def _lang_score_duckdb(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({markers})))"


@register(
    "text_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_labeled,
             {_lang_score_duckdb('en')} AS s_en,
             {_lang_score_duckdb('es')} AS s_es,
             {_lang_score_duckdb('fr')} AS s_fr,
             {_lang_score_duckdb('de')} AS s_de,
             {_lang_score_duckdb('zh')} AS s_zh
      FROM documents
    )
    SELECT doc_id, lang_labeled,
           CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
             WHEN 0 THEN 'und'
             WHEN s_en THEN 'en'
             WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr'
             WHEN s_de THEN 'de'
             ELSE 'zh' END AS lang_pred
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (argmax of per-language stopword hits,
    first-match tie-break en>es>fr>de>zh, 'und' when no marker hits).

    A real deployment swaps the lexicons for character n-gram profiles —
    the operator shape (per-row scoring, no shuffle) is identical.
    """
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: score(lang) for lang in ("en", "es", "fr", "de", "zh")}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lang in ("en", "es", "fr", "de", "zh"):  # tie-break order
        pred = pred.when(scores[lang] == best, lang)
    return d.select(
        "doc_id", F.col("lang").alias("lang_labeled"), pred.alias("lang_pred")
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS exact_fp,
           list_min([md5(s) for s in
             [array_to_string(words[i:i+2], ' ') for i in
               generate_series(1, greatest(len(words) - 2, 1))]]) AS shingle_fp
    FROM (SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS words
          FROM documents)
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash + min-hash over word
    3-gram shingles (the rolling-hash shape used for near-dup detection;
    md5 keeps it engine-portable and deterministic).

    ``ensure_min_partitions``: per-shingle md5 hashing dominates a
    shuffle of the raw docs (the util docstring's canonical case) — the
    single-file test corpus otherwise runs every hash on one core
    (measured 3.9s -> sub-second at sf0.1 on local[32]); a no-op on
    real multi-split inputs."""
    d = ensure_min_partitions(_docs(spark, sf_dir))
    words = F.split(F.lower(F.trim(F.col("text"))), " ")
    # F.get (0-based, NULL past the end) + concat_ws's null-skipping
    # mirrors the oracle's clamped list slice for docs shorter than one
    # shingle; bare words[i + 2] would ANSI-crash on a 1-2 word doc
    # (found by tests/test_property_diff.py, never by the sf corpora).
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 3, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.get(words, i), F.get(words, i + 1), F.get(words, i + 2)
        ),
    )
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("exact_fp"),
        F.array_min(F.transform(shingles, F.md5)).alias("shingle_fp"),
    )


# Cleaning patterns shared verbatim between Spark (Java regex) and DuckDB
# (RE2) — restricted to syntax both engines interpret identically.
_RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_URL = "https?://[^ ]+"
_RE_MULTISPACE = "  +"


@register(
    "text_clean",
    f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(text,
                '{_RE_URL}', '<URL>', 'g'),
                '{_RE_EMAIL}', '<EMAIL>', 'g'),
                '{_RE_MULTISPACE}', ' ', 'g')) AS clean_text,
           len(regexp_extract_all(text, '{_RE_URL}')) AS n_urls,
           len(regexp_extract_all(text, '{_RE_EMAIL}')) AS n_emails
    FROM documents
    """,
)
def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for training corpora: mask URLs and emails,
    collapse runs of whitespace, count what was masked.

    Per-row regexp_replace chain — JVM-side, narrow, scan-bound; the
    pattern set is restricted to regex syntax Java and RE2 share so the
    oracle is exact.
    """
    d = _docs(spark, sf_dir)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", _RE_URL, "<URL>"),
                _RE_EMAIL,
                "<EMAIL>",
            ),
            _RE_MULTISPACE,
            " ",
        )
    )
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all("text", F.lit(_RE_EMAIL), 0)).alias("n_emails"),
    )


@register(
    "text_vocab_topk",
    """
    WITH tok AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    )
    SELECT token, count(*) AS freq
    FROM tok
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 100
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: top-100 tokens by corpus frequency —
    the first step of tokenizer training.

    Scale: explode -> codegen'd count aggregate with map-side combine
    (the shuffle carries one row per distinct token per partition, not
    per occurrence); the global top-k is TakeOrderedAndProject. At
    100 TB the only growing state is the distinct-token set, which
    partial aggregation keeps bounded per task.
    """
    d = _docs(spark, sf_dir)
    tok = d.select(
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(100)
    )


@register(
    "pack_context_windows",
    """
    WITH sized AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
      FROM documents
    ), binned AS (
      SELECT lang, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 4096.0) AS BIGINT)
               AS bin
      FROM sized
    )
    -- CAST: DuckDB sum(int) -> HUGEINT -> pandas float64 (driver dtype
    -- hash-fail vs Spark int64)
    SELECT lang, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY lang, bin
    """,
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~4096-token training bins
    (greedy in doc_id order, per language) — the context-window packing
    step between curation and tokenization.

    The bin id is ``floor(running_tokens_before_doc / capacity)``: one
    window cumulative sum, deterministic, no driver loop. Scale:
    partitioned by lang so packing parallelizes across strata; a single
    global stream would serialize on one reducer — if one stratum
    dominates, sub-shard it with the hash-bucket trick and pack per
    (lang, shard).
    """
    d = register_sources(spark, sf_dir, tables=("documents",))["documents"]
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sized = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    binned = sized.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 4096.0).cast(
            "bigint"
        ),
    )
    return binned.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@register(
    "pipeline_corpus_curation",
    """
    WITH quality AS (
      SELECT doc_id, lang, source, text,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
      FROM documents
      WHERE n_chars >= 200
    ), deduped AS (
      SELECT min(doc_id) AS doc_id, md5(text) AS th,
             min(lang) AS lang, min(source) AS source, min(n_tokens) AS n_tokens
      FROM quality GROUP BY md5(text)
    ), sampled AS (
      SELECT * FROM deduped
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
    )
    SELECT lang, count(*) AS n_docs,
           -- CAST: DuckDB sum(int) -> HUGEINT -> pandas float64
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM sampled GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline in ONE declarative plan: length
    gate -> exact dedup (keep lowest doc_id per text hash) -> 50%
    deterministic sample -> per-language stats. The composition the
    engine exists for: each stage is an operator exercised elsewhere,
    chained here so Catalyst fuses the whole flow (filters reach the
    scan; the dedup groupBy is the only wide stage).

    Scale: the length gate and hash sample are scan-side; dedup
    shuffles on the text hash once; stats re-aggregate the survivor
    set. At 100 TB the same plan holds — swap exact dedup for the
    MinHash pair path when near-dup (not exact) semantics are needed.
    """
    d = register_sources(spark, sf_dir, tables=("documents",))["documents"]
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    quality = d.filter(F.col("n_chars") >= 200).select(
        "doc_id", "lang", "source", n_tokens.alias("n_tokens"), F.md5("text").alias("th")
    )
    deduped = quality.groupBy("th").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    sampled = deduped.filter(bucket < 50)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@register(
    "text_repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
                                           i -> ts[i] || ' ' || ts[i + 1])) AS bg
      FROM toks
    ), counts AS (
      SELECT doc_id, bg, count(*) AS c FROM grams GROUP BY doc_id, bg
    )
    SELECT doc_id,
           -- CAST: DuckDB sum(int) -> HUGEINT -> pandas float64
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           count(*) AS n_distinct_bigrams,
           round(1.0 - count(*) * 1.0 / sum(c), 4) AS dup_bigram_frac,
           round(max(c) * 1.0 / sum(c), 4) AS top_bigram_frac,
           (1.0 - count(*) * 1.0 / sum(c)) > 0.2 AS flag_repetitive
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals: per-document duplicate
    bigram fraction and most-frequent-bigram share, with a repetition
    flag. High duplicate-n-gram fractions are the standard boilerplate /
    spam signal in pretraining curation.

    Scale: bigrams stay row-local (zip_with over the token array — no
    self-join); the (doc, bigram) aggregate shuffles the gram stream
    once, and the per-doc rollup reuses that partitioning's doc_id
    prefix. Long documents fan out across tasks rather than serializing
    in a per-row O(n_distinct x n_tokens) mode computation.
    """
    d = _docs(spark, sf_dir)
    ts = F.split(F.col("text"), " ")
    bgs = F.zip_with(
        F.slice(ts, 1, F.size(ts) - 1),
        F.slice(ts, 2, F.size(ts) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        d.select("doc_id", F.explode(bgs).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup = 1.0 - F.count(F.lit(1)) * F.lit(1.0) / F.sum("c")
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.round(dup, 4).alias("dup_bigram_frac"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 4).alias("top_bigram_frac"),
        (dup > 0.2).alias("flag_repetitive"),
    )


@register(
    "text_char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), counts AS (
      SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS char_entropy,
           count(*) AS n_distinct_chars,
           log2(sum(c)) - sum(c * log2(c)) / sum(c) < 3.0 AS flag_low_entropy
    FROM counts GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the
    information-theoretic quality gate (near-zero entropy = repeated
    filler; natural text sits around 4-5 bits/char).

    Uses the single-pass identity H = log2(n) - sum(c*log2(c))/n so one
    aggregate computes it without a totals join.

    Scale: the char stream is |total chars| rows but partial aggregation
    collapses it to |doc x alphabet| before the shuffle; the per-doc
    rollup is tiny. No Python, no UDFs — stays in codegen.
    """
    d = _docs(spark, sf_dir)
    counts = (
        d.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h = F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
    return counts.groupBy("doc_id").agg(
        F.round(h, 4).alias("char_entropy"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        (h < 3.0).alias("flag_low_entropy"),
    )


@register(
    "train_split_shards",
    """
    WITH assigned AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT CASE WHEN substr(h, 1, 2) < 'cd' THEN 'train'
                WHEN substr(h, 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           substr(h, 3, 1) AS shard,
           count(*) AS n_docs,
           -- CAST: DuckDB sum(int) -> HUGEINT -> pandas float64
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM assigned
    GROUP BY 1, 2
    ORDER BY split, shard
    """,
)
def train_split_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) + 16-way shard
    assignment for a training corpus, with per-cell sizes.

    The assignment is pure hash arithmetic on the stable doc key:
    split from the first md5 byte ('cd' = 205/256 ~ 80.1%, 'e6' = 230),
    shard from the third hex nibble. No global sort, no row_number, no
    shuffle before the final 48-cell aggregate — every row's placement
    is computed independently at the scan, which is what makes the
    same split reproducible across engines, re-runs, and backfills.

    Scale: the naive alternative (ORDER BY rand()/row_number windows)
    serializes 100 TB through one partition; this is embarrassingly
    parallel and the downstream shard writer is just
    ``partitionBy(split, shard)``.
    """
    d = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    first2 = F.substring(h, 1, 2)
    return (
        d.select(
            F.when(first2 < "cd", "train")
            .when(first2 < "e6", "val")
            .otherwise("test")
            .alias("split"),
            F.substring(h, 3, 1).alias("shard"),
            "n_chars",
        )
        .groupBy("split", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars"))
        .orderBy("split", "shard")
    )


@register(
    "split_group_leakage_free",
    """
    WITH assigned AS (
      SELECT source, n_chars, md5(source) AS h FROM documents
    )
    SELECT CASE WHEN substr(h, 1, 2) < 'cd' THEN 'train'
                WHEN substr(h, 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           count(DISTINCT source) AS n_sources,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM assigned
    GROUP BY 1
    ORDER BY split
    """,
)
def split_group_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-leakage-free train/val/test split: hash the GROUP key
    (``source``) instead of the document key, so every document from
    one source lands in one split.

    train_split_shards hashes doc_id, which is correct when documents
    are independent — but training corpora aren't: near-duplicates
    cluster by origin (same site, same crawl, same book), and a
    doc-level split leaks train content into eval through those
    correlated groups (the published eval-contamination failure mode).
    Hashing the group key is the standard fix (GroupShuffleSplit):
    membership is still pure scan-side arithmetic, but the leakage
    unit is the group.

    Scale: identical shape to train_split_shards — no shuffle before
    the 3-row aggregate, reproducible across engines/re-runs/backfills
    because placement depends only on md5(source). The trade is split
    sizes now vary with group-size skew (one giant domain moves whole
    percentage points between splits) — acceptable for eval hygiene,
    and the n_sources/n_docs output is exactly the skew report.
    """
    d = _docs(spark, sf_dir)
    first2 = F.substring(F.md5(F.col("source")), 1, 2)
    return (
        d.select(
            F.when(first2 < "cd", "train")
            .when(first2 < "e6", "val")
            .otherwise("test")
            .alias("split"),
            "source",
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


@register(
    "mix_domain_weights",
    """
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS n_domains
      FROM per
    )
    SELECT source, n_docs, tokens,
           CASE WHEN total_tokens > 0
                THEN round(CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
           END AS natural_share,
           round(CAST(1 AS DOUBLE) / n_domains, 6) AS target_share,
           CASE WHEN tokens > 0 AND total_tokens > 0
                THEN round(least((CAST(1 AS DOUBLE) / n_domains)
                                 / (CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)),
                                 CAST(3 AS DOUBLE)), 4)
           END AS sample_rate
    FROM per, tot
    ORDER BY source
    """,
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling rates that move
    the corpus from its natural domain mix toward a target mix
    (uniform here; the published knob behind The Pile / DoReMi-style
    domain weights).

    sample_rate = target_share / natural_share, capped at 3x so a tiny
    domain is never epoch-ed into memorization — rates > 1 upsample,
    < 1 downsample, and the capped output is directly consumable by a
    Bernoulli/repeat sampler (sample_hash_pct's shape) per domain.
    Token mass is proxied by n_chars (the usual ~4 chars/token rule
    scales both sides of every ratio equally, so shares are unchanged).

    Scale: one groupBy over the corpus to |domains| rows, then a
    broadcast 1-row totals join — the same reduce-before-shuffle shape
    as the profiling family; share arithmetic is written with
    identical operand text on both engines so the IEEE results match
    bit-for-bit before the display rounding.
    """
    d = _docs(spark, sf_dir)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("tokens")
    )
    tot = per.agg(
        F.sum("tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_domains"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_docs",
            "tokens",
            # CASE-guarded, not try_divide: a token-less CORPUS (every
            # doc empty — a real partition shape at 100 TB) made the
            # unguarded division ANSI-crash the job, and a token-less
            # DOMAIN made sample_rate inf-vs-error diverge across
            # engines (found by the property suite). NULL = "share
            # undefined", emitted identically by both engines.
            "CASE WHEN total_tokens > 0 THEN"
            " round(CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)"
            " END AS natural_share",
            "round(CAST(1 AS DOUBLE) / n_domains, 6) AS target_share",
            "CASE WHEN tokens > 0 AND total_tokens > 0 THEN"
            " round(least((CAST(1 AS DOUBLE) / n_domains)"
            " / (CAST(tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)),"
            " CAST(3 AS DOUBLE)), 4) END AS sample_rate",
        )
        .orderBy("source")
    )


# -- chunking (RAG / training-window preparation) --------------------------

CHUNK_TOKENS = 64  # window size in whitespace tokens
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

# One chunking definition, shared by both operators (Spark side below,
# oracle CTEs here): a tokenizer/stride/tail-policy change edits ONE
# place, so text_chunk_windows' chunk ids and text_chunk_dedup's
# flagged hashes can never diverge.
_DUCK_CHUNKS = f"""
    WITH w AS (
      SELECT doc_id, string_split(trim(text), ' ') AS words
      FROM documents
    ), o AS (
      SELECT doc_id, words,
             unnest(generate_series(0, greatest(len(words) - 1, 0),
                                    {CHUNK_STRIDE})) AS off
      FROM w
    ), chunks AS (
      SELECT doc_id,
             -- integer div: plain / yields DOUBLE in DuckDB (dtype mismatch
             -- vs Spark's int chunk_idx under the driver's hash)
             off // {CHUNK_STRIDE} AS chunk_idx,
             len(words[off + 1 : off + {CHUNK_TOKENS}]) AS n_tokens,
             md5(array_to_string(words[off + 1 : off + {CHUNK_TOKENS}], ' '))
               AS chunk_hash
      FROM o
    )
"""


def _chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_hash), one row per
    token-window chunk — the Spark twin of ``_DUCK_CHUNKS``."""
    d = _docs(spark, sf_dir)
    w = d.select("doc_id", F.split(F.trim("text"), " ").alias("words"))
    o = w.select(
        "doc_id",
        "words",
        F.explode(
            F.expr(
                f"sequence(0, greatest(size(words) - 1, 0), {CHUNK_STRIDE})"
            )
        ).alias("off"),
    )
    chunk = F.expr(f"slice(words, off + 1, {CHUNK_TOKENS})")
    return o.select(
        "doc_id",
        (F.col("off") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "text_chunk_windows",
    _DUCK_CHUNKS + "SELECT doc_id, chunk_idx, n_tokens, chunk_hash FROM chunks",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: every document becomes
    ceil(len/stride) chunks of up to CHUNK_TOKENS whitespace tokens
    with CHUNK_TOKENS-CHUNK_STRIDE tokens of overlap — the preparation
    step for RAG indexing and fixed-window pretraining, with md5 chunk
    fingerprints for downstream chunk-level dedup.

    Shape: per-row split -> sequence(0, n-1, stride) -> explode ->
    slice + concat_ws, all inside whole-stage codegen; zero shuffles
    (the chunk relation inherits the scan's partitioning). The chunk
    *hash* is emitted rather than the chunk text so the operator's
    output stays fixed-width — the downstream joiner (dedup, index
    build) decides whether to re-materialize text.

    Scale: output rows = total_tokens/stride; the operator is
    scan-bandwidth-bound with no aggregate state. Pairing it with
    dedup_exact's groupBy on chunk_hash gives chunk-level exact dedup
    at the same single-shuffle cost.
    """
    return _chunk_frame(spark, sf_dir)


@register(
    "text_chunk_dedup",
    _DUCK_CHUNKS
    + """
    SELECT chunk_hash,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences
    FROM chunks
    GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal: token-window chunks appearing in two
    or more DISTINCT documents — the boilerplate / shared-template
    detector (headers, licenses, navigation text) that document-level
    dedup cannot see (Lee et al. 2022's core observation: most
    duplication in web corpora is substring-level).

    Shape: the shared chunking frame (``_chunk_frame`` — identical
    definition to text_chunk_windows by construction) composes with
    one groupBy on the chunk fingerprint — hash + counts shuffle,
    never chunk text. The HAVING prunes the unique-chunk tail (the
    vast majority) before anything returns.

    Scale: shuffle volume is one (16-byte hash, doc_id) pair per chunk
    = total_tokens/stride rows; flagged chunks join back to
    (doc_id, chunk_idx) for surgical removal, leaving the rest of each
    document in the corpus.
    """
    return (
        _chunk_frame(spark, sf_dir)
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "text_perplexity_proxy",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), tok_ne AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), uni AS (
      SELECT token, count(*) AS n FROM tok_ne GROUP BY token
    ), tot AS (
      SELECT sum(n) AS big_n FROM uni
    ), scored AS (
      -- integer micro-unit terms BEFORE summation: avg() of raw
      -- doubles folds in engine-specific order (the EWMA lesson —
      -- a half-boundary ulp is a latent parity flake); bigint sums
      -- are order-free and the single division is bit-identical.
      SELECT t.doc_id,
             CAST(round(-ln(uni.n / (tot.big_n * 1e0)) * 1000000)
               AS BIGINT) AS nll_micro
      FROM tok_ne t JOIN uni ON t.token = uni.token, tot
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(CAST(sum(nll_micro) AS BIGINT)
                 / (count(*) * 1e6), 4) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document — the model-free core of
    CCNet-style perplexity filtering: a doc whose tokens are improbable
    under the corpus unigram distribution reads as noise/gibberish
    (high avg negative log-likelihood); boilerplate scores near the
    corpus floor. The real pipeline thresholds or buckets this score;
    emitting per-doc (n_tokens, avg_nll) keeps every value under the
    oracle hash.

    Scale: the unigram table is the bounded distinct-token set (same
    state argument as text_vocab_topk) and joins back broadcast; the
    per-doc aggregate is one shuffle on doc_id. Swapping the unigram
    table for a real KenLM/llm scorer changes the scoring join's right
    side, not the plan shape.
    """
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # corpus total folded in as a 1-row broadcast — a driver-side
    # .first() here would re-run the whole tokenize pipeline once
    # extra just to fetch one number
    tot = uni.agg(F.sum("n").cast("double").alias("big_n"))
    scored = (
        tok.join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            # micro-unit terms before summation (see oracle comment)
            F.round(-F.log(F.col("n") / F.col("big_n")) * 1e6)
            .cast("bigint")
            .alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum("nll_micro").cast("bigint")
            / (F.count(F.lit(1)) * F.lit(1e6)),
            4,
        ).alias("avg_nll"),
    )


# -- DSIR importance resampling weights (data selection) -------------------

# Hashed n-gram feature buckets for DSIR (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): unigrams +
# bigrams hash into B buckets; a doc's importance weight is the sum of
# per-feature log-ratios between the target-domain and raw bucket
# distributions. 512 buckets is the fixture-scale setting (DSIR's 10k
# buckets fits the same plan — B only sizes two tiny broadcast tables).
DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"  # in-domain proxy on the synthetic corpus

# Engine-neutral 32-bit feature hash (module rule: md5 everywhere).
_DSIR_BUCKET_SPARK = (
    f"cast(conv(substr(md5(gram), 1, 8), 16, 10) as bigint) % {DSIR_BUCKETS}"
)
_DSIR_BUCKET_DUCK = (
    f"('0x' || substr(md5(gram), 1, 8))::BIGINT % {DSIR_BUCKETS}"
)
# Per-feature log importance ratio, Laplace-smoothed, in integer
# micro-units BEFORE summation (float addition does not commute across
# engines; bigint addition does — the module's float-parity rule).
# `1e0` not `1.0`: Spark parses `1.0` as DECIMAL and would run the whole
# ratio in truncating decimal arithmetic (measured: wrong in the 9th
# digit, flipping ~20% of micro-roundings); the exponent form is DOUBLE
# in both engines, keeping the IEEE chain bit-identical.
_DSIR_TERM = (
    "round(ln(((ct + 1e0) / (tt + {B})) / ((cr + 1e0) / (tr + {B})))"
    " * 1000000)"
)


@register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, lang, unnest(list_concat(
               t,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i + 1])
                    ELSE [] END)) AS gram
      FROM toks
    ), bucketed AS (
      SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS b FROM grams
    ), stats AS (
      SELECT b,
             count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS ct,
             count(*) AS cr
      FROM bucketed GROUP BY b
    ), totals AS (
      SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
      FROM stats
    ), ratio AS (
      SELECT b, CAST({_DSIR_TERM.format(B=DSIR_BUCKETS)} AS BIGINT) AS term
      FROM stats, totals
    )
    SELECT doc_id,
           count(*) AS n_feats,
           CAST(sum(term) AS BIGINT) AS logw_micro
    FROM bucketed JOIN ratio USING (b)
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: score every document by how much more
    likely its hashed unigram+bigram features are under the TARGET
    domain's bucket distribution than under the raw corpus's — the
    published recipe for selecting in-domain pretraining data by
    importance resampling (select ~ softmax of logw). Target here is
    the ``lang = 'en'`` slice; in production it is the trusted
    high-quality corpus (e.g. curated text vs common crawl).

    Shape: one tokenize+explode pass builds the feature stream, which
    partial-aggregates map-side into per-(doc, lang, bucket) counts —
    ONE exchange that BOTH consumers reuse (Catalyst ReusedExchange):
    the B=512-row bucket stats on one side, the per-doc weighted sum on
    the other (the per-bucket log-ratio table joins back BROADCAST).
    Before round 5 the stats branch and the scoring branch each re-ran
    the tokenize+explode narrow stage (~2x the heavy work); sharing the
    pre-aggregated exchange removed the second pass.

    Scale: the only data-sized shuffle is that single per-cell exchange
    (smaller than the gram stream — bounded by 512 cells/doc/lang);
    the bucket distribution is O(B) state however big the corpus —
    that boundedness is DSIR's whole point, and at 100 TB the stats
    pass is typically computed once per corpus snapshot and reused
    across selection runs (here both passes run in one query so the
    oracle can state the end-to-end value).
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        "lang",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("t"),
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(t, CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(0, size(t) - 2), "
                "i -> t[i] || ' ' || t[i + 1]) "
                "ELSE array() END)"
            )
        ).alias("gram"),
    )
    bucketed = grams.select(
        "doc_id", "lang", F.expr(_DSIR_BUCKET_SPARK).alias("b")
    )
    # ONE exchange both branches reuse: per-(doc, lang, bucket) counts.
    # The explicit isNotNull guard is semantics-free (b is a hash of a
    # non-null gram) but REQUIRED for the reuse: the scoring join
    # infers `isnotnull(b)` into its branch only, which would make the
    # two subtrees canonically unequal and defeat ReusedExchange.
    percell = (
        bucketed.filter(F.col("b").isNotNull())
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = percell.groupBy("b").agg(
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("c")).otherwise(0)
        ).cast("bigint").alias("ct"),
        F.sum("c").cast("bigint").alias("cr"),
    )
    totals = stats.agg(
        F.sum("ct").cast("bigint").alias("tt"),
        F.sum("cr").cast("bigint").alias("tr"),
    )
    ratio = (
        stats.crossJoin(F.broadcast(totals))
        .selectExpr(
            "b",
            f"CAST({_DSIR_TERM.format(B=DSIR_BUCKETS)} AS BIGINT) AS term",
        )
    )
    return (
        percell.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("term")).cast("bigint").alias("logw_micro"),
        )
    )


# -- DSIR selection: Gumbel-top-k over the importance weights --------------

DSIR_SELECT_K = 100


def _dsir_select_oracle() -> str:
    # Composed from the registered DSIR oracle so the weights can never
    # drift from the driver-checked operator. Deterministic Gumbel
    # noise: u from an md5-derived 32-bit uniform (engine-neutral hash,
    # +0.5 keeps u in (0,1)), g = -ln(-ln(u)); with bit-identical u
    # both engines' ln agree in practice (see parity notes).
    from ..queries import ORACLES

    return f"""
    WITH w AS ({ORACLES["dsir_importance_weights"]}),
    noised AS (
      SELECT doc_id, n_feats, logw_micro,
             -ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      ::BIGINT + 0.5) / 4294967296.0)) AS g
      FROM w
    )
    SELECT doc_id, n_feats, logw_micro,
           CAST(round((logw_micro / 1e6 + g) * 1e6) AS BIGINT)
             AS score_micro
    FROM noised
    ORDER BY score_micro DESC, doc_id
    LIMIT {DSIR_SELECT_K}
    """


@register("dsir_select_topk", _dsir_select_oracle())
def dsir_select_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's SELECTION step (Xie et al. 2023): sample-without-
    replacement proportional to the importance weights via the
    Gumbel-top-k identity — add an independent Gumbel(0,1) to each
    document's RAW log importance weight (the published form; a
    per-feature-normalized weight would shrink the signal below the
    Gumbel noise and degenerate to uniform sampling) and keep the
    top k. The noise is
    DETERMINISTIC (md5-derived uniform per doc_id), so the selection is
    reproducible run-to-run and engine-exact — the property a training
    pipeline needs to re-materialize the same corpus subset.

    Composition: the weights are the SAME registered operator (and the
    oracle embeds the same registered oracle), so selection can't drift
    from the driver-checked scorer. Scale: one extra narrow projection
    over the weight stream, then a global top-k as a TakeOrdered heap
    merge — O(k) driver traffic at any corpus size; k scales to a
    sampling RATE by replacing the limit with a score threshold chosen
    from the weight distribution (same plan minus the heap).
    """
    w = dsir_importance_weights(spark, sf_dir)
    u = (
        "(cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) "
        "as bigint) + 0.5) / 4294967296.0"
    )
    noised = w.withColumn("g", F.expr(f"-ln(-ln({u}))"))
    return (
        noised.select(
            "doc_id",
            "n_feats",
            "logw_micro",
            F.round(
                (F.col("logw_micro") / F.lit(1e6) + F.col("g"))
                * F.lit(1e6)
            ).cast("bigint").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(DSIR_SELECT_K)
    )


# -- BPE merge-step pair counts (tokenizer training) -----------------------


@register(
    "bpe_pair_counts",
    """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, count(*) AS n FROM words WHERE w <> '' GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) AS pair,
             n
      FROM vocab WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step's statistics: corpus-wide frequencies of
    adjacent character pairs, weighted by word frequency — argmax over
    this table IS the next merge in byte-pair-encoding tokenizer
    training (Sennrich et al. 2016).

    The scalable trick: pair generation runs over the DISTINCT word
    vocabulary (bounded, Heaps-law growth), not the token stream — each
    word contributes its pairs once, weighted by its corpus count. At
    100 TB the token explode reduces to the vocab in one shuffle and
    everything after is O(|vocab| x word_len); iterating merges re-runs
    only the vocab-side pair generation with the merged symbol table.
    """
    d = _docs(spark, sf_dir)
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "n",
        )
    )
    return pairs.groupBy("pair").agg(
        F.sum("n").cast("bigint").alias("pair_count")
    )


# -- bigram-LM scoring (KenLM-style quality filtering, one step up) --------

# Add-one-smoothed bigram negative log-likelihood per token, in integer
# micro-units per bigram (the float-parity sum rule). `1e0` keeps the
# arithmetic DOUBLE in both engines (see _DSIR_TERM).
_BIGRAM_NLL = "round(-ln((pair_n + 1e0) / (ctx_n + v)) * 1000000)"


@register(
    "text_bigram_lm_nll",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '),
                                 t -> t <> '') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks WHERE len(t) >= 2
    ), pair AS (
      SELECT bigram, count(*) AS pair_n FROM bg GROUP BY bigram
    ), ctx AS (
      SELECT string_split(bigram, ' ')[1] AS w1,
             CAST(sum(pair_n) AS BIGINT) AS ctx_n
      FROM pair GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(DISTINCT string_split(bigram, ' ')[2]) AS BIGINT) AS v
      FROM pair
    ), scored AS (
      SELECT bg.doc_id,
             CAST({_BIGRAM_NLL} AS BIGINT) AS nll_micro
      FROM bg
      JOIN pair USING (bigram)
      JOIN ctx ON ctx.w1 = string_split(bg.bigram, ' ')[1]
      CROSS JOIN vocab
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(nll_micro) AS BIGINT) AS nll_sum_micro
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (add-one smoothing) — one
    step up from the unigram perplexity proxy toward the KenLM filter
    CCNet actually runs: a document whose token TRANSITIONS are
    improbable under the corpus bigram distribution reads as shuffled /
    machine-generated even when its unigrams look fine.

    Shape: one tokenize pass emits the bigram stream; pair counts and
    per-context totals are Heaps-law-bounded aggregates; vocab size is
    a 1-row broadcast; scoring joins counts back onto the stream and
    the per-doc reduce sums integers (micro-unit NLL terms, so the sum
    is engine-exact — float summation order never matters).

    Scale: identical to text_perplexity_proxy plus one more
    vocab-bounded aggregate; at 100 TB the count tables are the
    materialize-once artifact and scoring is one hash join per stream
    row. Swapping in a real KenLM changes the scoring join's right
    side, not the plan.
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(trim(text)), ' '), t -> t <> '')").alias("t"),
    )
    bg = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> t[i] || ' ' || t[i + 1])")
        ).alias("bigram"),
    )
    # ONE exchange both consumers reuse (same trick as DSIR): the raw
    # bigram stream partial-aggregates into per-(doc, bigram) counts;
    # the count-table branch and the scoring join both read that
    # exchange (ReusedExchange) instead of re-running tokenize+explode.
    # The per-instance NLL term depends only on (pair_n, ctx_n, v), so
    # weighting by c is exact.
    # The two isNotNull guards are semantics-free (a bigram is a
    # concatenation of non-null tokens) but make the branch subtrees
    # canonically EQUAL: the scoring joins infer isnotnull(bigram) and
    # isnotnull(split(bigram)[0]) into their branch only, which would
    # otherwise defeat ReusedExchange.
    percell = bg.filter(
        F.col("bigram").isNotNull() & F.split("bigram", " ")[0].isNotNull()
    ).groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    pair = percell.groupBy("bigram").agg(
        F.sum("c").cast("bigint").alias("pair_n")
    )
    ctx = (
        pair.groupBy(F.split("bigram", " ")[0].alias("w1"))
        .agg(F.sum("pair_n").cast("bigint").alias("ctx_n"))
    )
    vocab = pair.agg(
        F.countDistinct(F.split("bigram", " ")[1]).cast("bigint").alias("v")
    )
    scored = (
        percell.join(pair, "bigram")
        .join(ctx, F.split(percell["bigram"], " ")[0] == ctx["w1"])
        .crossJoin(F.broadcast(vocab))
        .selectExpr(
            "doc_id", "c", f"CAST({_BIGRAM_NLL} AS BIGINT) AS nll_micro"
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("c") * F.col("nll_micro")).cast("bigint").alias("nll_sum_micro"),
    )


# -- Gopher-style quality rules (rounds 5-6) ---------------------------------

# The published Gopher/MassiveText quality-filter family (Rae et al.
# 2021, Table A1): documents fail on word count, mean word length,
# repetition, symbol-to-word ratio, bullet/ellipsis line shares,
# duplicate lines, or missing common stopwords. The repetition gate is
# STOPWORD-AWARE (round 6): natural English is legitimately ~5-7% "the",
# so the share gate is computed over non-stopword tokens — the published
# recipe's intent (catch "ping pong ping pong ...", not prose).
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 10_000_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MAX_TOP_WORD_FRAC = 0.30  # repetition gate: top NON-stopword share
GOPHER_MAX_SYMBOL_RATIO = 0.10  # '#' + '…' occurrences per word
GOPHER_MAX_BULLET_FRAC = 0.90  # lines starting with a bullet marker
GOPHER_MAX_ELLIPSIS_FRAC = 0.30  # lines ending with '...' / '…'
GOPHER_MAX_DUP_LINE_FRAC = 0.30  # (n_lines - n_distinct_lines) / n_lines
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


@register(
    "quality_gopher_rules",
    f"""
    WITH toks AS (
      SELECT doc_id,
             -- whitespace tokens via an EXPLICIT class: Java regex
             -- backslash-s includes U+000B but RE2's does not, so
             -- spelling the set out is the only engine-identical form
             list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'),
                         t -> t <> '') AS t,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '')
               AS ls,
             CAST(length(text) - length(replace(text, '#', ''))
                  + length(text) - length(replace(text, '…', '')) AS BIGINT)
               AS n_symbols
      FROM documents
    ), stats AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             CASE WHEN len(t) = 0 THEN NULL ELSE
               round(list_sum(list_transform(t,
                   w -> CAST(length(w) AS DOUBLE))) / len(t), 6) END
               AS mean_word_len,
             CAST(coalesce(list_max(list_transform(
                 list_distinct(list_filter(t,
                     w -> w NOT IN ({_GOPHER_STOP_SQL}))),
                 w -> len(list_filter(t, x -> x = w)))), 0) AS BIGINT)
               AS top_word_n,
             len(list_filter(t, w -> w IN ({_GOPHER_STOP_SQL}))) > 0
               AS has_stopword,
             n_symbols,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
             CAST(len(list_filter(ls, l -> ltrim(l) LIKE '-%'
                 OR ltrim(l) LIKE '*%' OR ltrim(l) LIKE '•%')) AS BIGINT)
               AS n_bullet_lines,
             CAST(len(list_filter(ls, l -> rtrim(l) LIKE '%...'
                 OR rtrim(l) LIKE '%…')) AS BIGINT) AS n_ellipsis_lines
      FROM toks
    )
    SELECT doc_id, n_words, mean_word_len,
           CASE WHEN n_words = 0 THEN NULL ELSE
             round(top_word_n * 1e0 / n_words, 6) END AS top_word_frac,
           has_stopword,
           round(n_symbols * 1e0 / greatest(n_words, 1), 6)
             AS symbol_word_ratio,
           round(n_dup_lines * 1e0 / greatest(n_lines, 1), 6)
             AS dup_line_frac,
           round(n_bullet_lines * 1e0 / greatest(n_lines, 1), 6)
             AS bullet_line_frac,
           round(n_ellipsis_lines * 1e0 / greatest(n_lines, 1), 6)
             AS ellipsis_line_frac,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND coalesce(mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
                         AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN},
                         FALSE)
            AND top_word_n * 1e0 / greatest(n_words, 1)
                <= {GOPHER_MAX_TOP_WORD_FRAC}
            AND has_stopword
            AND n_symbols * 1e0 / greatest(n_words, 1)
                <= {GOPHER_MAX_SYMBOL_RATIO}
            AND n_dup_lines * 1e0 / greatest(n_lines, 1)
                <= {GOPHER_MAX_DUP_LINE_FRAC}
            AND n_bullet_lines * 1e0 / greatest(n_lines, 1)
                <= {GOPHER_MAX_BULLET_FRAC}
            AND n_ellipsis_lines * 1e0 / greatest(n_lines, 1)
                <= {GOPHER_MAX_ELLIPSIS_FRAC}) AS passes
    FROM stats
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality gates per document (Rae et al. 2021,
    Table A1): word-count bounds, mean-word-length bounds, top
    NON-stopword repetition share, stopword presence, symbol-to-word
    ratio ('#' and '…'), duplicate-line fraction, and bullet/ellipsis
    line shares — each signal emitted alongside the combined verdict so
    a pipeline can tune thresholds without re-scanning.

    The repetition gate deliberately excludes stopwords: English prose
    is legitimately ~5-7% "the", so a raw top-word share flags normal
    text; the gate's published intent is mechanical repetition. Empty /
    whitespace-only documents are EMITTED with n_words=0, NULL
    mean_word_len, and passes=false (not silently dropped) so an
    anti-join on passes=false cannot let them through.

    Scale: one narrow pass per document (split + array aggregates, all
    codegen; the top-word count is an in-array group-by via aggregate
    over the sorted array — no explode, no shuffle at all until any
    downstream summary). The embarrassing-parallel shape is the point:
    quality gating 100 TB is scan-bound.
    """
    d = _docs(spark, sf_dir)
    stop_sql = _GOPHER_STOP_SQL
    toks = d.select(
        "doc_id",
        F.expr(
            "filter(split(text, '[ \\\\t\\\\n\\\\f\\\\r]+'), t -> t <> '')"
        ).alias("t"),
        F.expr("filter(split(text, '\\n'), l -> trim(l) <> '')").alias("ls"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
            + F.length("text") - F.length(F.expr("replace(text, '…', '')"))
        ).cast("bigint").alias("n_symbols"),
    )
    stats = toks.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_words"),
        F.when(
            F.size("t") > 0,
            F.round(
                F.expr("aggregate(t, 0D, (acc, w) -> acc + length(w))")
                / F.size("t"),
                6,
            ),
        ).alias("mean_word_len"),
        # top non-stopword count without explode: sort the filtered
        # array, then the longest run of equal neighbours IS the max
        # frequency (0 for stopword-only / empty docs).
        F.expr(
            f"aggregate(sort_array(filter(t, w -> w NOT IN ({stop_sql}))), "
            "struct(0L AS best, 0L AS run, "
            "CAST(NULL AS STRING) AS prev), "
            "(acc, w) -> struct("
            "greatest(acc.best, CASE WHEN acc.prev IS NOT NULL AND w = acc.prev "
            "THEN acc.run + 1 ELSE 1 END) AS best, "
            "CASE WHEN acc.prev IS NOT NULL AND w = acc.prev "
            "THEN acc.run + 1 ELSE 1 END AS run, w AS prev), "
            "acc -> acc.best)"
        ).cast("bigint").alias("top_word_n"),
        F.expr(
            f"size(filter(t, w -> w IN ({stop_sql}))) > 0"
        ).alias("has_stopword"),
        "n_symbols",
        F.size("ls").cast("bigint").alias("n_lines"),
        (F.size("ls") - F.size(F.array_distinct("ls")))
        .cast("bigint").alias("n_dup_lines"),
        F.expr(
            "size(filter(ls, l -> ltrim(l) LIKE '-%' "
            "OR ltrim(l) LIKE '*%' OR ltrim(l) LIKE '•%'))"
        ).cast("bigint").alias("n_bullet_lines"),
        F.expr(
            "size(filter(ls, l -> rtrim(l) LIKE '%...' "
            "OR rtrim(l) LIKE '%…'))"
        ).cast("bigint").alias("n_ellipsis_lines"),
    )
    one = F.lit(1e0)
    n_words_safe = F.greatest(F.col("n_words"), F.lit(1))
    n_lines_safe = F.greatest(F.col("n_lines"), F.lit(1))
    return stats.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("top_word_n") * one / F.col("n_words"), 6),
        ).alias("top_word_frac"),
        "has_stopword",
        F.round(F.col("n_symbols") * one / n_words_safe, 6).alias(
            "symbol_word_ratio"
        ),
        F.round(F.col("n_dup_lines") * one / n_lines_safe, 6).alias(
            "dup_line_frac"
        ),
        F.round(F.col("n_bullet_lines") * one / n_lines_safe, 6).alias(
            "bullet_line_frac"
        ),
        F.round(F.col("n_ellipsis_lines") * one / n_lines_safe, 6).alias(
            "ellipsis_line_frac"
        ),
        (
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS)
            & F.coalesce(
                (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
                & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN),
                F.lit(False),
            )
            & (
                F.col("top_word_n") * one / n_words_safe
                <= GOPHER_MAX_TOP_WORD_FRAC
            )
            & F.col("has_stopword")
            & (
                F.col("n_symbols") * one / n_words_safe
                <= GOPHER_MAX_SYMBOL_RATIO
            )
            & (
                F.col("n_dup_lines") * one / n_lines_safe
                <= GOPHER_MAX_DUP_LINE_FRAC
            )
            & (
                F.col("n_bullet_lines") * one / n_lines_safe
                <= GOPHER_MAX_BULLET_FRAC
            )
            & (
                F.col("n_ellipsis_lines") * one / n_lines_safe
                <= GOPHER_MAX_ELLIPSIS_FRAC
            )
        ).alias("passes"),
    )


# -- C4-style line-level cleaning + page gates (round 6) ---------------------

# The C4 recipe (Raffel et al. 2020, §2.2): KEEP only lines that end in
# terminal punctuation and have at least 5 words; then DISCARD pages
# with fewer than 3 sentences, any "lorem ipsum", or a curly brace
# (code signal). Unlike Gopher's page-level gates this is a TRANSFORM +
# gate: clean_text is the kept-lines page a downstream tokenizer
# actually consumes.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


@register(
    "quality_c4_rules",
    f"""
    WITH pages AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '')
               AS ls,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             contains(text, '{{') AS has_brace
      FROM documents
    ), kept AS (
      SELECT doc_id, has_lorem, has_brace,
             CAST(len(ls) AS BIGINT) AS n_lines,
             list_filter(ls, l ->
               (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
                OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
               AND len(list_filter(string_split(l, ' '), w -> w <> ''))
                   >= {C4_MIN_LINE_WORDS}) AS kl
      FROM pages
    ), stats AS (
      SELECT doc_id, has_lorem, has_brace, n_lines,
             CAST(len(kl) AS BIGINT) AS n_kept_lines,
             coalesce(array_to_string(kl, chr(10)), '') AS clean_text
      FROM kept
    )
    SELECT doc_id, n_lines, n_kept_lines,
           round(n_kept_lines * 1e0 / greatest(n_lines, 1), 6)
             AS kept_line_frac,
           CAST(length(clean_text) - length(replace(clean_text, '.', ''))
                + length(clean_text) - length(replace(clean_text, '!', ''))
                + length(clean_text) - length(replace(clean_text, '?', ''))
             AS BIGINT) AS n_sentences,
           has_lorem, has_brace, clean_text,
           (length(clean_text) - length(replace(clean_text, '.', ''))
            + length(clean_text) - length(replace(clean_text, '!', ''))
            + length(clean_text) - length(replace(clean_text, '?', ''))
              >= {C4_MIN_SENTENCES}
            AND NOT has_lorem AND NOT has_brace) AS passes
    FROM stats
    """,
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning + page gates (Raffel et al. 2020, §2.2): keep only
    lines ending in terminal punctuation with >= 5 words
    (``clean_text`` is the kept page), then gate pages on >= 3
    sentences, no "lorem ipsum", no curly brace.
    Emits the per-page signals alongside the verdict AND the cleaned
    text, so the same pass feeds both filtering and tokenization.

    Scale: identical shape to quality_gopher_rules — one narrow
    per-document pass, all in-array codegen (split / filter / LIKE /
    replace-count), zero shuffles. C4 on 100 TB is scan-bound; the
    cleaned page rides the same row, so no second pass re-reads the
    corpus to materialize it.
    """
    d = _docs(spark, sf_dir)
    pages = d.select(
        "doc_id",
        F.expr("filter(split(text, '\\n'), l -> trim(l) <> '')").alias("ls"),
        F.expr("contains(lower(text), 'lorem ipsum')").alias("has_lorem"),
        F.expr("contains(text, '{')").alias("has_brace"),
    )
    kept = pages.select(
        "doc_id",
        "has_lorem",
        "has_brace",
        F.size("ls").cast("bigint").alias("n_lines"),
        F.expr(
            "filter(ls, l -> "
            "(rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!' "
            "OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%\"') "
            "AND size(filter(split(l, ' '), w -> w <> '')) "
            f">= {C4_MIN_LINE_WORDS})"
        ).alias("kl"),
    )
    stats = kept.select(
        "doc_id",
        "has_lorem",
        "has_brace",
        "n_lines",
        F.size("kl").cast("bigint").alias("n_kept_lines"),
        F.array_join("kl", "\n").alias("clean_text"),
    )
    n_sent = (
        F.length("clean_text")
        - F.length(F.expr("replace(clean_text, '.', '')"))
        + F.length("clean_text")
        - F.length(F.expr("replace(clean_text, '!', '')"))
        + F.length("clean_text")
        - F.length(F.expr("replace(clean_text, '?', '')"))
    ).cast("bigint")
    return stats.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.round(
            F.col("n_kept_lines") * F.lit(1e0)
            / F.greatest(F.col("n_lines"), F.lit(1)),
            6,
        ).alias("kept_line_frac"),
        n_sent.alias("n_sentences"),
        "has_lorem",
        "has_brace",
        "clean_text",
        (
            (n_sent >= C4_MIN_SENTENCES)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("passes"),
    )


# -- duplicate-shingle fraction (RefinedWeb-style, round 5) ------------------

DUP_SHINGLE_N = 5  # 5-gram shingles, the near-dup filter's unit


@register(
    "dedup_shingle_fraction",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, len(t) - {DUP_SHINGLE_N} + 2),
               i -> array_to_string(list_slice(t, i, i + {DUP_SHINGLE_N} - 1), ' ')
             )) AS shingle
      FROM toks WHERE len(t) >= {DUP_SHINGLE_N}
    ), df AS (
      SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_shingles,
           round(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) * 1e0
                 / count(*), 6) AS dup_frac
    FROM sh JOIN df USING (shingle)
    GROUP BY sh.doc_id
    """,
)
def dedup_shingle_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-shingle fraction per document: the share of a doc's
    distinct {DUP_SHINGLE_N}-gram shingles that also appear in at least
    one OTHER document — the RefinedWeb/MassiveWeb "duplicated n-gram"
    near-dup signal, the content-overlap filter that exact and MinHash
    dedup both miss (partial copies, boilerplate).

    Shape (round 6, rewritten JOINLESS): a shingle with document
    frequency 1 has exactly ONE owner, so
    n_dup(doc) = n_shingles(doc) − |{doc's shingles that are unique
    corpus-wide}| — the per-doc dup count falls out of two
    AGGREGATIONS over the distinct (doc, shingle) pairs (per-doc
    totals; per-shingle (df, min-owner) → unique-owner counts) plus a
    doc-level join of two |docs|-row tables. The earlier join-back of
    the full pair stream onto the df table sort-merged 37M rows twice;
    measured at x30 replication the joinless form is 2.1s vs 37.5s in
    the same session (~17x). Shingles are HASHED to 64-bit keys
    scan-side (xxhash64) so both exchanges carry 8-byte longs; per-doc
    counts are unchanged up to 64-bit collisions (~n²/2⁶⁴, vanishing),
    which is why the string-keyed DuckDB oracle still matches exactly.
    Shingle df remains the only corpus-global state (Heaps-bounded).
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("t"),
    ).filter(F.size("t") >= DUP_SHINGLE_N)
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {DUP_SHINGLE_N}), "
                    f"i -> xxhash64(array_join(slice(t, i + 1, "
                    f"{DUP_SHINGLE_N}), ' ')))"
                )
            ).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())  # canonical-equality guard
        .distinct()
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    uniq_owned = (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("doc_id"),
        )
        .filter(F.col("n_docs") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_uniq"))
    )
    n_dup = (
        F.col("n_shingles") - F.coalesce(F.col("n_uniq"), F.lit(0))
    ).cast("bigint")
    return per_doc.join(uniq_owned, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        n_dup.alias("n_dup_shingles"),
        F.round(n_dup * F.lit(1e0) / F.col("n_shingles"), 6).alias(
            "dup_frac"
        ),
    )


# -- dup-cluster size distribution (round 5) ---------------------------------


@register(
    "dedup_cluster_stats",
    """
    WITH clusters AS (
      SELECT md5(text) AS h, count(*) AS cluster_size
      FROM documents GROUP BY md5(text)
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS rows_covered
    FROM clusters GROUP BY cluster_size
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram: how many clusters exist
    at each multiplicity and how many rows they cover — the dedup
    DIAGNOSTIC that decides strategy before any dedup runs (a corpus
    whose mass sits in size-2 clusters wants hash dedup; a few giant
    clusters want popularity caps).

    Scale: two cascaded aggregations, each with map-side partial
    aggregation; the first shuffles md5 keys (16 bytes/row), the
    second shuffles |distinct sizes| rows. No full-text shuffle — the
    hash IS the key.
    """
    d = _docs(spark, sf_dir)
    clusters = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("rows_covered"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "rows_covered",
    )


# -- quality funnel: the audit report a curation run starts with (round 6) --

# Composed AFTER the gate operators so their registered oracle texts can
# be reused verbatim as subqueries — the funnel's oracle is BY
# CONSTRUCTION consistent with each gate's own driver-checked oracle.
from ..queries import ORACLES as _ORACLES  # noqa: E402

DUP_FRAC_GATE = 0.5  # shingle-overlap survival threshold


def _funnel_oracle() -> str:
    return f"""
    SELECT 'c4' AS gate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE passes) AS BIGINT) AS n_pass,
           round(count(*) FILTER (WHERE passes) * 1e0 / count(*), 6)
             AS pass_frac
    FROM ({_ORACLES["quality_c4_rules"]})
    UNION ALL
    SELECT 'exact_unique',
           CAST(sum(dup_count) AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(count(*) * 1e0 / sum(dup_count), 6)
    FROM ({_ORACLES["dedup_exact"]})
    UNION ALL
    SELECT 'gopher',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE passes) AS BIGINT),
           round(count(*) FILTER (WHERE passes) * 1e0 / count(*), 6)
    FROM ({_ORACLES["quality_gopher_rules"]})
    UNION ALL
    SELECT 'nondup_shingle',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE dup_frac <= {DUP_FRAC_GATE})
             AS BIGINT),
           round(count(*) FILTER (WHERE dup_frac <= {DUP_FRAC_GATE})
                 * 1e0 / count(*), 6)
    FROM ({_ORACLES["dedup_shingle_fraction"]})
    ORDER BY gate
    """


@register("pipeline_quality_funnel", _funnel_oracle())
def pipeline_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation audit report: per gate family (Gopher page gates,
    C4 page gates, duplicate-shingle overlap <= {0.5}, exact-hash
    uniqueness), how many documents enter and how many survive — the
    first table any 100 TB pipeline run produces, and the one that
    decides which gate to tune before burning a full pass.

    Composition, not reimplementation: each branch calls the SAME
    registered operator (and the oracle reuses the SAME registered
    oracle SQL), so the funnel can never drift from the gates it
    summarizes. Each branch aggregates to ONE row map-side
    (count/conditional-count only); the union of four 1-row aggregates
    involves no join, so the funnel costs exactly the sum of its
    branches' scans (the shingle branch's exchange is the only real
    shuffle; for the exact-dup branch only 16-byte hashes move).

    Note the denominators are each gate's own input contract: gopher/C4
    see every document (empty docs included, round 6), the shingle gate
    sees documents long enough to have a 5-gram, exact-dedup counts all
    rows vs surviving hash groups.
    """
    from .dedup import dedup_exact

    def one(gate: str, df: DataFrame, pass_col) -> DataFrame:
        # coalesce + try_divide: a gate whose input contract admits ZERO
        # documents (e.g. no doc long enough for a 5-gram) must report
        # n_pass = 0 and pass_frac = NULL like the oracle's
        # count(*) FILTER / x-over-0 — Spark's bare sum() over empty is
        # NULL and an ANSI 0/0 would crash (round-8 hypothesis find)
        n_pass = F.coalesce(
            F.sum(F.when(pass_col, 1).otherwise(0)), F.lit(0)
        ).cast("bigint")
        return df.agg(
            F.lit(gate).alias("gate"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            n_pass.alias("n_pass"),
            F.round(
                F.try_divide(n_pass * F.lit(1e0), F.count(F.lit(1))), 6
            ).alias("pass_frac"),
        )

    gopher = one(
        "gopher", quality_gopher_rules(spark, sf_dir), F.col("passes")
    )
    c4 = one("c4", quality_c4_rules(spark, sf_dir), F.col("passes"))
    shingle = one(
        "nondup_shingle",
        dedup_shingle_fraction(spark, sf_dir),
        F.col("dup_frac") <= DUP_FRAC_GATE,
    )
    exact = dedup_exact(spark, sf_dir).agg(
        F.lit("exact_unique").alias("gate"),
        F.sum("dup_count").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_pass"),
        F.round(
            F.count(F.lit(1)) * F.lit(1e0) / F.sum("dup_count"), 6
        ).alias("pass_frac"),
    )
    return (
        c4.unionByName(exact)
        .unionByName(gopher)
        .unionByName(shingle)
        .orderBy("gate")
    )


# -- exact substring dedup: block removal (round 6) --------------------------

DEDUP_BLOCK_TOKENS = 16  # removal granularity, tokens per block


def _block_removal_oracle() -> str:
    b = DEDUP_BLOCK_TOKENS
    return f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), t -> t <> '') AS t
      FROM documents
    ), blk AS (
      SELECT doc_id, len(t) AS n_tokens,
             unnest(range(1, greatest((len(t) + {b} - 1) // {b}, 1) + 1))
               AS blk,
             unnest(list_transform(
               range(1, greatest((len(t) + {b} - 1) // {b}, 1) + 1),
               i -> array_to_string(list_slice(t, (i-1)*{b} + 1, i*{b}), ' ')
             )) AS block
      FROM w
    ), c AS (
      SELECT block, count(DISTINCT doc_id) AS nd
      FROM blk WHERE n_tokens > 0 GROUP BY block
    ), f AS (
      SELECT blk.*, coalesce(c.nd >= 2, FALSE) AND blk.n_tokens > 0 AS dup
      FROM blk LEFT JOIN c USING (block)
    )
    SELECT doc_id,
           CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed_blocks,
           CAST(coalesce(sum(CASE WHEN dup
             THEN len(string_split(block, ' ')) END), 0) AS BIGINT)
             AS n_removed_tokens,
           round(coalesce(sum(CASE WHEN dup
                 THEN len(string_split(block, ' ')) END), 0) * 1e0
                 / greatest(max(n_tokens), 1), 6) AS removed_frac,
           coalesce(string_agg(
             CASE WHEN n_tokens > 0 AND NOT dup THEN block END,
             ' ' ORDER BY blk), '') AS clean_text
    FROM f GROUP BY doc_id
    """


@register("dedup_block_removal", _block_removal_oracle())
def dedup_block_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, REMOVE step (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): cut each document into
    consecutive DEDUP_BLOCK_TOKENS-token (16) blocks, drop every block
    whose exact text occurs in >= 2 DISTINCT documents, and re-emit the
    cleaned text — the surgical-removal pass that text_chunk_dedup's
    flag-only output promises. Whole-document dedup misses shared
    boilerplate (headers, licenses, templates); this removes just those
    spans and keeps the rest of each page.

    Shape: one posexplode into fixed blocks; the duplicate-block set is
    derived from an (md5, doc_id)-only aggregation — block TEXT never
    enters that exchange — then broadcast back onto the block stream, so
    the only shuffle carrying text is the final per-document reassembly
    (output-sized, unavoidable: the product IS the cleaned corpus).
    Zero-token documents pass through as n_blocks=0 / clean_text='' —
    never silently dropped.

    Scale: at 100 TB the dup-block set is boilerplate-bounded (Heaps-ish;
    Lee et al. report ~1-3%% of blocks); if it outgrows the broadcast
    threshold the same plan degrades gracefully to a shuffle join keyed
    by the 8-byte hash. Two corpus scans (count + removal) is the
    published two-pass structure of the suffix-array pipeline itself.
    """
    b = DEDUP_BLOCK_TOKENS
    d = _docs(spark, sf_dir)
    w = d.select(
        "doc_id",
        F.expr("filter(split(trim(text), ' '), t -> t <> '')").alias("t"),
    )
    nb = f"greatest((size(t) + {b} - 1) div {b}, 1)"
    blocks = w.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, {nb}), "
                f"i -> concat_ws(' ', slice(t, (i-1)*{b} + 1, {b})))"
            )
        ).alias("blk0", "block"),
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("blk0") + 1).alias("blk"),
        "block",
        # md5, not xxhash64: a 64-bit cross-doc collision would delete a
        # unique block AND diverge from the text-keyed oracle; 128 bits
        # is collision-free at any realistic corpus (same tradeoff as
        # dedup_exact). Swap to xxhash64 only where 2^-64 loss is
        # acceptable and key bytes dominate the exchange.
        F.md5("block").alias("h"),
    )
    dups = (
        blocks.filter(F.col("n_tokens") > 0)
        .select("h", "doc_id")
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select(F.col("h").alias("dup_h"))
    )
    flagged = blocks.join(
        F.broadcast(dups), F.col("h") == F.col("dup_h"), "left"
    ).select(
        "doc_id",
        "n_tokens",
        "blk",
        "block",
        (F.col("dup_h").isNotNull() & (F.col("n_tokens") > 0)).alias("dup"),
    )
    blk_tokens = F.expr("size(split(block, ' '))")
    return flagged.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.sum(F.when(F.col("n_tokens") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_blocks"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed_blocks"),
        F.coalesce(
            F.sum(F.when(F.col("dup"), blk_tokens)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_removed_tokens"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("dup"), blk_tokens)), F.lit(0))
            * F.lit(1e0)
            / F.greatest(F.max("n_tokens"), F.lit(1)),
            6,
        ).alias("removed_frac"),
        F.coalesce(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN "
                    "n_tokens > 0 AND NOT dup THEN struct(blk, block) END)), "
                    "s -> s.block)"
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )


# -- BPE merge training (round 6) --------------------------------------------

BPE_MERGE_STEPS = 4  # training steps; each yields one merge rule
BPE_CHECKPOINT_EVERY = 2  # truncate vocab lineage every N merges (see _learn_merges)


def _bpe_vocab_ctes(k: int = BPE_MERGE_STEPS) -> str:
    """CTE-unrolled BPE trainer state: the chain up to (and including)
    vocab{k}, the post-merge tokenization state. Token state strings
    are '||'-joined ('||h||e||y||'): one occurrence of pair (a,b) is
    the substring '|a||b|', which borrows ONE bar from each side's
    double delimiter — so a single replace() pass performs exactly the
    left-greedy non-overlapping merge of classic BPE, consecutive
    occurrences included. Consumers append their own final SELECT
    (merge table for the trainer, the corpus join for the encoder)."""
    parts = [
        r"""
    WITH words AS (
      -- explicit whitespace class (the engine-parity class: Java \s
      -- includes U+000B, RE2 does not) so no word retains \n / \r —
      -- '.' excludes line terminators differently per engine, and a
      -- newline inside a word would corrupt the char-wrapping below.
      SELECT unnest(list_filter(
               string_split_regex(lower(trim(text)), '[ \t\n\f\r]'),
               w -> w <> '')) AS word
      FROM documents
    ), vocab0 AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
             '|' || regexp_replace(word, '(?s)(.)', '|\1|', 'g') || '|'
               AS state
      FROM words
      WHERE NOT contains(word, '|')  -- delimiter guard, both engines
      GROUP BY word
    )"""
    ]
    for i in range(k):
        parts.append(f"""
    , toks{i} AS (
      SELECT freq, list_filter(string_split(state, '||'), x -> x <> '') AS t
      FROM vocab{i}
    ), pairs{i} AS (
      SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(t)),
                      j -> {{'a': t[j], 'b': t[j+1]}})) AS p
        FROM toks{i} WHERE len(t) >= 2
      ) GROUP BY p.a, p.b
    ), best{i} AS (
      SELECT a, b, cnt FROM pairs{i} ORDER BY cnt DESC, a, b LIMIT 1
    ), vocab{i + 1} AS (
      -- LEFT JOIN, not a cross join: when best{i} is EMPTY (the corpus
      -- ran out of mergeable pairs before step K) the vocabulary must
      -- carry forward unmerged — the trainer BREAKS its loop there; a
      -- cross join against the empty best row deleted the whole
      -- vocabulary and the encode pass lost every word (found by the
      -- property suite on a single-word corpus with one merge).
      SELECT word, freq,
             CASE WHEN a IS NULL THEN state
                  ELSE replace(state, '|' || a || '||' || b || '|',
                               '|' || a || b || '|') END AS state
      FROM vocab{i} LEFT JOIN best{i} ON true
    )""")
    return "".join(parts)


def _bpe_merges_oracle(k: int = BPE_MERGE_STEPS) -> str:
    """Trainer oracle: the vocab CTE chain plus the merge-table select."""
    union = "\n    UNION ALL ".join(
        f"SELECT {i + 1} AS step, a, b, a || b AS merged, cnt FROM best{i}"
        for i in range(k)
    )
    return _bpe_vocab_ctes(k) + f"\n    SELECT * FROM ({union}) ORDER BY step"


def _bpe_base_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, state) initial BPE vocabulary — char-wrapped
    '||'-delimited states. NOTE the four backslashes in the split
    class: Spark's SQL string unescaper has no case for \f (it maps
    \t/\n/\r but silently drops the backslash before f), so the
    two-backslash form would split words on the LETTER 'f'. '\\\\f'
    delivers a literal backslash-f to the regex engine, which reads it
    as form feed — same as the gopher gate."""
    d = _docs(spark, sf_dir)
    words = d.select(
        F.explode(
            F.expr(
                "filter(split(lower(trim(text)), '[ \\\\t\\\\n\\\\f\\\\r]'), "
                "w -> w <> '')"
            )
        ).alias("word")
    )
    return (
        words.filter(~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn(
            "state",
            F.concat(
                F.lit("|"),
                F.regexp_replace("word", r"(?s)(.)", r"|$1|"),
                F.lit("|"),
            ),
        )
    )


@register("bpe_train_merges", _bpe_merges_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016): starting from
    characters, repeatedly find the corpus-wide most-frequent adjacent
    token pair (frequency-weighted over the word vocabulary, ties broken
    lexicographically) and merge it, BPE_MERGE_STEPS times. Emits the
    learned merge table (step, a, b, merged, cnt) — the artifact a
    tokenizer ships. Extends bpe_pair_counts (one counting pass) into
    the full iterative trainer.

    Merge application uses the '||'-delimited state encoding (see
    _bpe_merges_oracle): replace('|a||b|' -> '|ab|') IS the left-greedy
    non-overlapping merge, so both engines apply byte-identical
    tokenization state transitions — no UDF, no recursion.

    Shape: the corpus is scanned ONCE to build the (word, freq, state)
    vocabulary, which is persisted; each training step is one
    explode-and-aggregate over the VOCABULARY (Heaps-bounded — millions
    of rows at 100 TB, not corpus-sized) plus a 1-row argmax collect and
    a map-side literal replace. This is exactly how published distributed
    BPE trainers structure the loop: corpus-sized work once, per-step
    work vocabulary-sized.
    """
    rows, _ = _trained_bpe(spark, sf_dir)
    return local_rows_df(spark, 
        rows, "step int, a string, b string, merged string, cnt bigint"
    ).orderBy("step")


def _trained_bpe(spark: SparkSession, sf_dir: str):
    """(merge rows, final vocabulary frame) — memoized per
    (applicationId, sf_dir) via dedup._STAGE_MEMO, so the trainer and
    the encoder (and repeated bench runs) share ONE persisted base
    vocabulary and ONE pass of the 4-collect training loop per
    session+dataset instead of re-training per call."""
    from .dedup import _STAGE_MEMO, _memo_key

    key = _memo_key(spark, sf_dir, "bpe_trained")
    if key in _STAGE_MEMO:
        return _STAGE_MEMO[key]
    base = _bpe_base_vocab(spark, sf_dir).persist()
    base.count()  # single linear cache fill before the loop's reads
    out = _learn_merges(base)
    _STAGE_MEMO[key] = out
    return out


def _learn_merges(
    base: DataFrame,
    steps: int = BPE_MERGE_STEPS,
    checkpoint_every: int = BPE_CHECKPOINT_EVERY,
):
    """Run the ``steps``-merge BPE training loop over a (word, freq,
    state) vocabulary frame (persisted by the caller). Returns (merge
    rows, final vocabulary frame with post-merge states) — shared by the
    trainer (which emits the rows) and the encoder (which consumes the
    final states).

    Lineage control: each merge stacks one ``F.replace`` on the vocab
    plan, so an unbounded loop re-analyzes an ever-deeper tree every
    step — fine at 4 merges, pathological at a real 32k-merge
    vocabulary (measured: scripts/probe_bpe_checkpoint.py, table in
    SCALE.md). Every ``checkpoint_every`` merges the vocabulary is
    materialized via ``localCheckpoint(eager=True)``, truncating the
    plan to a scan of the checkpointed blocks; superseded checkpoint
    RDDs are reclaimed by Spark's ContextCleaner once dereferenced. On
    a real cluster a reliable artifact (table write / checkpoint dir)
    replaces localCheckpoint for fault tolerance — same shape, the
    trainer just swaps the materialization call. ``checkpoint_every=0``
    disables truncation (the probe's control arm)."""
    vocab = base
    rows: list[tuple[int, str, str, str, int]] = []
    for step in range(1, steps + 1):
        toks = vocab.select(
            "freq",
            F.expr(
                "filter(split(state, '\\\\|\\\\|'), x -> x <> '')"
            ).alias("t"),
        )
        pairs = toks.filter(F.size("t") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "j -> struct(element_at(t, j) AS a, "
                    "element_at(t, j + 1) AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.select(
                F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq"
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        rows.append((step, a, b, a + b, cnt))
        vocab = vocab.withColumn(
            "state",
            F.replace(
                F.col("state"),
                F.lit(f"|{a}||{b}|"),
                F.lit(f"|{a}{b}|"),
            ),
        )
        if checkpoint_every and step % checkpoint_every == 0 and step < steps:
            vocab = vocab.localCheckpoint(eager=True)
    return rows, vocab


# -- dedup strategy funnel (round 6, cont.) ----------------------------------


def _dedup_funnel_oracle() -> str:
    return f"""
    SELECT 'block' AS method, 'blocks' AS unit,
           CAST(sum(n_blocks) AS BIGINT) AS n_input,
           CAST(sum(n_removed_blocks) AS BIGINT) AS n_removed,
           round(sum(n_removed_blocks) * 1e0 / sum(n_blocks), 6)
             AS removed_frac
    FROM ({_ORACLES["dedup_block_removal"]})
    UNION ALL
    SELECT 'exact', 'docs',
           CAST(sum(dup_count) AS BIGINT),
           CAST(sum(dup_count) - count(*) AS BIGINT),
           round((sum(dup_count) - count(*)) * 1e0 / sum(dup_count), 6)
    FROM ({_ORACLES["dedup_exact"]})
    UNION ALL
    SELECT 'minhash', 'docs',
           (SELECT count(*) FROM documents),
           (SELECT count(*) FROM documents) - count(*),
           round(((SELECT count(*) FROM documents) - count(*)) * 1e0
                 / (SELECT count(*) FROM documents), 6)
    FROM ({_ORACLES["dedup_minhash_survivors"]})
    UNION ALL
    SELECT 'semantic', 'vectors',
           (SELECT count(*) FROM embeddings),
           (SELECT count(*) FROM embeddings) - count(*),
           round(((SELECT count(*) FROM embeddings) - count(*)) * 1e0
                 / (SELECT count(*) FROM embeddings), 6)
    FROM ({_ORACLES["dedup_semantic"]})
    ORDER BY method
    """


@register("pipeline_dedup_funnel", _dedup_funnel_oracle())
def pipeline_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup STRATEGY report, sibling of pipeline_quality_funnel:
    for each dedup method (exact hash, MinHash near-dup, substring block
    removal, SemDeDup) — how much would it remove, in its own unit —
    the table a 100 TB curation run produces FIRST to decide which
    dedup passes are worth a full-corpus execution and in which order
    (Lee et al. 2022 report exactly this comparison).

    Composition, not reimplementation: every branch calls the SAME
    registered operator and the oracle embeds the SAME registered
    oracle SQL, so the report can never drift from the methods it
    compares. Each branch collapses to ONE row map-side; the two
    survivor-based branches combine two 1-row aggregates via a
    broadcast crossJoin (1 x 1 rows). All removed_frac ratios are one
    division of exact integers.
    """
    from .dedup import (
        dedup_exact,
        dedup_minhash_survivors,
        dedup_semantic,
    )

    def ratio(removed, total):
        # try_divide: a corpus with zero units in a branch (e.g. one
        # empty doc -> no blocks) reports a NULL fraction like the
        # oracle's x/0, not an ANSI DIVIDE_BY_ZERO (round-8 hypothesis
        # find, same class as pipeline_quality_funnel's empty gate)
        return F.round(F.try_divide(removed * F.lit(1e0), total), 6)

    block = dedup_block_removal(spark, sf_dir).agg(
        F.lit("block").alias("method"),
        F.lit("blocks").alias("unit"),
        F.sum("n_blocks").cast("bigint").alias("n_input"),
        F.sum("n_removed_blocks").cast("bigint").alias("n_removed"),
        ratio(F.sum("n_removed_blocks"), F.sum("n_blocks")).alias(
            "removed_frac"
        ),
    )
    exact = dedup_exact(spark, sf_dir).agg(
        F.lit("exact").alias("method"),
        F.lit("docs").alias("unit"),
        F.sum("dup_count").cast("bigint").alias("n_input"),
        (F.sum("dup_count") - F.count(F.lit(1))).cast("bigint").alias(
            "n_removed"
        ),
        ratio(
            F.sum("dup_count") - F.count(F.lit(1)), F.sum("dup_count")
        ).alias("removed_frac"),
    )
    src = register_sources(
        spark, sf_dir, tables=("documents", "embeddings")
    )
    n_docs = src["documents"].agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    n_vecs = src["embeddings"].agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    mh_surv = dedup_minhash_survivors(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_surv")
    )
    sem_surv = dedup_semantic(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_surv")
    )

    def survivors(method: str, unit: str, total_df, surv_df) -> DataFrame:
        return total_df.crossJoin(F.broadcast(surv_df)).select(
            F.lit(method).alias("method"),
            F.lit(unit).alias("unit"),
            F.col("n_total").alias("n_input"),
            (F.col("n_total") - F.col("n_surv")).alias("n_removed"),
            ratio(
                F.col("n_total") - F.col("n_surv"), F.col("n_total")
            ).alias("removed_frac"),
        )

    return (
        block.unionByName(exact)
        .unionByName(survivors("minhash", "docs", n_docs, mh_surv))
        .unionByName(survivors("semantic", "vectors", n_vecs, sem_surv))
        .orderBy("method")
    )


# -- hashed linear quality classifier (round 6, cont.) ------------------------

CLS_BUCKETS = 1024   # hashed feature space (fastText-style)
CLS_W_SPAN = 20001   # integer weights in [-10000, 10000] (1e-4 units)


def _classifier_oracle() -> str:
    b32 = "('0x' || substr(md5({x}), 1, 8))::BIGINT"
    bucket = f"({b32.format(x='feat')} % {CLS_BUCKETS})"
    w_int = (
        f"({b32.format(x=f'CAST({bucket} AS VARCHAR)')} % {CLS_W_SPAN})"
        " - 10000"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '),
                         w -> w <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id,
             unnest(t || list_transform(range(1, len(t)),
                                        j -> t[j] || ' ' || t[j+1])) AS feat
      FROM toks
    ), agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum({w_int}) AS BIGINT) AS logit_q
      FROM feats GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_feats, 0) AS n_feats,
           coalesce(a.logit_q, 0) AS logit_q,
           round(coalesce(a.logit_q, 0)
                 / (greatest(coalesce(a.n_feats, 0), 1) * 10000.0), 6)
             AS mean_w,
           coalesce(a.logit_q, 0) >= 0 AND coalesce(a.n_feats, 0) > 0
             AS passes
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


@register("quality_classifier_score", _classifier_oracle())
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (the GPT-3 / FineWeb-Edu
    recipe class): a linear model over HASHED word unigram + bigram
    features scores each page, and pages below the threshold drop.
    Heuristic gates (Gopher/C4) encode rules; the classifier encodes a
    reference distribution — production pipelines run both.

    The weight vector here is deterministic (md5-derived per bucket),
    so both engines and the oracle score identically — the PLUMBING is
    the recipe: hashed features (no vocabulary table to ship), integer
    1e-4-unit weights so the per-doc logit is an ORDER-FREE bigint sum
    (a float dot product would fold in partition order — the EWMA
    class), and a threshold on the logit (equivalent to thresholding
    the sigmoid, no transcendentals near rounding boundaries).
    Swapping in trained fastText / regression weights is a literal
    table swap; the plan is unchanged.

    Shape: explode unigram+bigram features (codegen; in-array
    higher-order scoring would evaluate interpreted), two md5 calls per
    feature, one groupBy(doc_id) carrying (doc_id, int) rows, one
    |docs|-row join back so empty documents emit n_feats=0 /
    passes=false rather than vanishing. Scan-bound at 100 TB; the
    weight "table" is arithmetic, so nothing broadcasts.
    """
    d = _docs(spark, sf_dir)
    b32 = "cast(conv(substr(md5({x}), 1, 8), 16, 10) as bigint)"
    bucket = f"({b32.format(x='feat')} % {CLS_BUCKETS})"
    w_int = (
        f"({b32.format(x=f'cast({bucket} as string)')} % {CLS_W_SPAN})"
        " - 10000"
    )
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(trim(text)), ' '), w -> w <> '')").alias(
            "t"
        ),
    )
    # CASE-guarded bigrams: sequence(1, size-1) with size<2 produces a
    # DESCENDING range ([1,0]) and element_at then throws on the empty
    # array — caught by the empty-doc rows of the three-way corpus
    # (slice(t, 1, 0) is the type-correct empty array)
    feats = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "concat(t, CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), "
                "j -> concat(element_at(t, j), ' ', element_at(t, j + 1))) "
                "ELSE slice(t, 1, 0) END)"
            )
        ).alias("feat"),
    )
    agg = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        F.sum(F.expr(w_int)).cast("bigint").alias("logit_q"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("logit_q", F.lit(0)).alias("logit_q"),
        F.round(
            F.coalesce("logit_q", F.lit(0))
            / (F.greatest(F.coalesce("n_feats", F.lit(0)), F.lit(1))
               * F.lit(10000.0)),
            6,
        ).alias("mean_w"),
        (
            (F.coalesce("logit_q", F.lit(0)) >= 0)
            & (F.coalesce("n_feats", F.lit(0)) > 0)
        ).alias("passes"),
    )


def _bpe_encode_oracle() -> str:
    return _bpe_vocab_ctes() + f"""
    , ntok AS (
      SELECT word,
             CAST(len(list_filter(string_split(state, '||'),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM vocab{BPE_MERGE_STEPS}
    ), dw AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(lower(trim(text)), '[ \t\n\f\r]'),
               w -> w <> '' AND NOT contains(w, '|'))) AS word
      FROM documents
    ), agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n.n_tok) AS BIGINT) AS n_bpe_tokens,
             CAST(sum(length(dw.word)) AS BIGINT) AS n_chars
      FROM dw JOIN ntok n USING (word)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
           coalesce(a.n_chars, 0) AS n_chars,
           round(coalesce(a.n_chars, 0) * 1e0
                 / greatest(coalesce(a.n_bpe_tokens, 0), 1), 4)
             AS chars_per_token
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


@register("bpe_encode_corpus", _bpe_encode_oracle())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE pass: apply the learned merge table (the
    bpe_train_merges artifact) to the corpus and report per-document
    token counts and chars-per-token — the number that decides context
    budgets, packing, and $/token for a training run. Completes the
    tokenizer story: pair counts -> trainer -> corpus encoding.

    Shape: tokenization states live on the VOCABULARY (Heaps-bounded),
    never on the token stream — the trained per-word token count is a
    tiny (word, n_tok) relation broadcast onto the per-doc word stream,
    so the corpus-sized side only explodes words and sums integers
    (order-free bigint sums; chars_per_token is one division of exact
    ints). Empty docs emit zeros via the |docs|-row join back.

    Scale: same learning cost as bpe_train_merges (corpus scanned once
    for word counts, per-step work vocab-sized), then ONE more corpus
    scan for the encode join. At a production merge count (~32k), the
    per-word state chain becomes a vocab-sized iterative job with the
    same shape — per-doc work never exceeds a broadcast lookup.
    """
    _, final_vocab = _trained_bpe(spark, sf_dir)
    ntok = final_vocab.select(
        "word",
        F.expr(
            "cast(size(filter(split(state, '\\\\|\\\\|'), "
            "x -> x <> '')) as bigint)"
        ).alias("n_tok"),
    )
    d = _docs(spark, sf_dir)
    dw = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(split(lower(trim(text)), "
                "'[ \\\\t\\\\n\\\\f\\\\r]'), "
                "w -> w <> '' AND NOT contains(w, '|'))"
            )
        ).alias("word"),
    )
    agg = (
        dw.join(F.broadcast(ntok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.round(
            F.coalesce("n_chars", F.lit(0))
            * F.lit(1e0)
            / F.greatest(
                F.coalesce("n_bpe_tokens", F.lit(0)), F.lit(1)
            ),
            4,
        ).alias("chars_per_token"),
    )


# -- CCNet-style perplexity bucketing (round 7) -------------------------------

_PPL_PROXY_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), tok_ne AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), uni AS (
      SELECT token, count(*) AS n FROM tok_ne GROUP BY token
    ), tot AS (
      SELECT sum(n) AS big_n FROM uni
    ), scored AS (
      SELECT t.doc_id,
             CAST(round(-ln(uni.n / (tot.big_n * 1e0)) * 1000000)
               AS BIGINT) AS nll_micro
      FROM tok_ne t JOIN uni ON t.token = uni.token, tot
    ), ppl AS (
      SELECT doc_id, count(*) AS n_tokens,
             round(CAST(sum(nll_micro) AS BIGINT)
                   / (count(*) * 1e6), 4) AS avg_nll
      FROM scored GROUP BY doc_id
    )
"""


@register(
    "ccnet_perplexity_buckets",
    _PPL_PROXY_SQL
    + """
    , b AS (
      SELECT doc_id, n_tokens, avg_nll,
             ntile(3) OVER (ORDER BY avg_nll, doc_id) AS nt
      FROM ppl
    )
    SELECT d.doc_id,
           coalesce(b.n_tokens, 0) AS n_tokens,
           b.avg_nll,
           CASE b.nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     WHEN 3 THEN 'tail' ELSE 'tail' END AS bucket
    FROM documents d LEFT JOIN b USING (doc_id)
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): order the
    corpus by language-model score and split into head / middle / tail
    thirds — the published recipe keeps head+middle for pretraining and
    drops (or down-weights) the tail. The score here is the unigram
    cross-entropy proxy (text_perplexity_proxy; swap in KenLM and the
    plan shape is unchanged — the scoring join's right side changes).
    No-drop contract: token-less docs can't be scored, so they emit
    bucket='tail' with NULL score (the gate-contract lesson from
    quality_gopher_rules).

    Shape note: ntile over a global ORDER BY (rounded score, doc_id) is
    a single-partition window — fine at audit scale and it keeps the
    oracle exact; at 100 TB the production form samples the score
    distribution (percentile_approx) for the two cutoffs and assigns
    buckets as a scan-side comparison against those two literals, no
    global sort. Ties at the 4-decimal score break on doc_id, so both
    engines produce the identical tiling.
    """
    from pyspark.sql import Window as W

    from .dedup import _STAGE_MEMO, _memo_key

    key = _memo_key(spark, sf_dir, "ppl_proxy")
    if key in _STAGE_MEMO:
        ppl = _STAGE_MEMO[key]
    else:
        from ..queries import QUERIES

        ppl = QUERIES["text_perplexity_proxy"](spark, sf_dir)
        _STAGE_MEMO[key] = ppl
    b = ppl.withColumn(
        "nt", F.ntile(3).over(W.orderBy("avg_nll", "doc_id"))
    )
    d = _docs(spark, sf_dir).select("doc_id")
    return d.join(b, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        "avg_nll",
        F.when(F.col("nt") == 1, "head")
        .when(F.col("nt") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
