"""Python user-defined table functions (Spark 3.5+/4.x ``@udtf``).

The reference's whole point is managing *table functions* as first-class
build units (`/root/reference/macros/udf/table_function.sql:1-32`,
`/root/reference/models/udf/table_function/test_table_function.sql`).
Its TVFs are SQL-bodied because BigQuery offers nothing else for
table-valued routines; Spark additionally supports table functions whose
body is Python — the natural escape hatch when row-expansion logic
(tokenizers, parsers, samplers) outgrows SQL. This module puts that
surface under the same driver oracle as the SQL TVFs.

Execution model (and why it scales): a UDTF runs inside the executor's
Python worker per input partition — ``eval`` is called per row and may
yield any number of output rows, which stream back over Arrow
(``useArrow=True``). A LATERAL join against a UDTF is therefore a
narrow, partition-local expansion: no shuffle, no driver involvement,
parallelism = input partitions, exactly like ``explode`` but with
arbitrary Python between input and output rows. The slow part is the
Python boundary itself, which is why the closed-form operators elsewhere
in this engine stay in codegen; a UDTF is the *measured* fallback for
logic SQL genuinely cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..queries import register
from .analytics import _src


@udtf(returnType="idx: int, sentence: string", useArrow=True)
class SplitSentences:
    """Sentence splitter: yields (position, sentence) per '. '-delimited
    piece, space-trimmed, empties dropped. Deliberately simple and
    deterministic so DuckDB's ``str_split`` can state the same rows."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        for i, piece in enumerate(text.split(". ")):
            piece = piece.strip(" ")
            if piece:
                yield i, piece


@register(
    "udtf_sentence_stats",
    """
    WITH sent AS (
      SELECT d.doc_id, trim(u.s, ' ') AS sentence
      FROM documents d, unnest(str_split(d.text, '. ')) AS u(s)
      WHERE trim(u.s, ' ') <> ''
    )
    SELECT doc_id,
           count(*) AS n_sentences,
           round(avg(length(sentence)), 4) AS avg_sentence_chars,
           max(length(sentence)) AS max_sentence_chars
    FROM sent GROUP BY doc_id
    """,
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence statistics via a Python UDTF in a LATERAL
    join — the Python-bodied counterpart of the reference's SQL table
    function (reference: table_function.sql's materialization; here the
    *body* is Python, the invocation surface is identical SQL).

    The oracle restates the expansion with DuckDB's str_split/unnest, so
    the UDTF's row-generation semantics (split on '. ', space-trim,
    drop empties) are hash-checked end to end.

    Scale: LATERAL UDTF is partition-local — a 100 TB documents table
    fans out to sentences with zero shuffle; the one aggregation that
    follows is the only exchange. Arrow batching (useArrow=True) keeps
    the Python boundary vectorized.
    """
    spark.udtf.register("split_sentences", SplitSentences)
    _src(spark, sf_dir)["documents"].createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id,
               count(*) AS n_sentences,
               round(avg(length(s.sentence)), 4) AS avg_sentence_chars,
               max(length(s.sentence)) AS max_sentence_chars
        FROM __docs_udtf d, LATERAL split_sentences(d.text) s
        GROUP BY d.doc_id
        """
    )


@udtf(returnType="lang: string, doc_id: bigint, n_chars: bigint, rnk: int")
class TopDocsPerLang:
    """Grouped UDTF: top-3 documents by (n_chars DESC, doc_id ASC) per
    language partition. State is a bounded heap of k entries — O(k)
    memory per group regardless of group size, the property that makes
    the operator safe on a 100 TB partition."""

    K = 3

    def __init__(self):
        import heapq

        self._heapq = heapq
        # (n_chars, -doc_id): heap root is the worst entry kept —
        # smallest n_chars, ties broken toward evicting larger doc_id.
        self.heap: list[tuple[int, int]] = []
        # PARTITION BY guarantees one language per UDTF instance.
        self.lang = None

    def eval(self, row):
        self.lang = row["lang"]
        self._heapq.heappush(self.heap, (row["n_chars"], -row["doc_id"]))
        if len(self.heap) > self.K:
            self._heapq.heappop(self.heap)

    def terminate(self):
        top = sorted(self.heap, key=lambda t: (-t[0], -t[1]))
        for i, (n, neg_id) in enumerate(top):
            yield self.lang, -neg_id, n, i + 1


@register(
    "udtf_grouped_topk",
    """
    SELECT lang, doc_id, n_chars, rnk FROM (
      SELECT lang, doc_id, n_chars,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id
             ) AS INT) AS rnk
      FROM documents
    ) WHERE rnk <= 3
    """,
)
def udtf_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language longest documents via a UDTF *table argument* with
    ``PARTITION BY`` (Spark 4 polymorphic-UDTF calling convention):
    ``FROM top_docs_per_lang(TABLE(docs) PARTITION BY lang)`` runs one
    UDTF instance per language group, each seeing only its group's rows
    — the distributed grouped-Python-logic surface, same shape as
    ``applyInPandas`` but row-streamed and SQL-invocable like the
    reference's TVFs.

    The oracle restates the semantics as a rank window, so the grouped
    execution (partitioning, per-group isolation, heap correctness) is
    hash-checked exactly.

    Scale: Spark shuffles once on the PARTITION BY key; each group
    streams through its instance with O(k) state (bounded heap — see
    class docstring), so a billion-doc language costs k entries of
    memory, not a buffer of the group.
    """
    spark.udtf.register("top_docs_per_lang", TopDocsPerLang)
    _src(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "n_chars"
    ).createOrReplaceTempView("__docs_topk")
    return spark.sql(
        "SELECT * FROM top_docs_per_lang(TABLE(__docs_topk) PARTITION BY lang)"
    )
