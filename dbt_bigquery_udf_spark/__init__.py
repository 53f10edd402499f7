"""dbt_bigquery_udf_spark — a PySpark-native analytics engine with the
capabilities of the reference dbt project ``joshua881117/dbt-bigquery-udf``.

The reference (see ``/root/reference``) is a dbt-on-BigQuery project whose
core contribution is managing BigQuery UDFs (scalar ``FUNCTION`` and
``TABLE FUNCTION``) as first-class build units via custom materializations
(reference: ``macros/udf/function.sql``, ``macros/udf/table_function.sql``),
plus a demo DAG: external source -> scalar UDF -> table function ->
materialized datamart table.

This package re-expresses that Spark-first:

- models compile to Spark SQL DDL (``CREATE OR REPLACE FUNCTION ...``)
  executed in-process against the Spark catalog; Catalyst is the
  parser/optimizer/executor (no custom rules needed — SQL UDF/TVF inlining,
  predicate pushdown and column pruning are built in).
- the BigQuery dialect surface the reference's models rely on
  (``PARSE_DATETIME``, ``SAFE.`` prefix, ``INT64``/``DATETIME`` types) is
  provided by a translation layer (:mod:`.functions.dialect`).
- beyond reference parity, :mod:`.operators` adds the large-scale
  training-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) the driver mandates, designed for
  100 TB / multi-executor scale and tested locally.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .sources.registry import register_sources  # noqa: F401
