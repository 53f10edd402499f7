{{ config(params=['kind STRING']) }}

-- A parameterized table function (BigQuery `CREATE TABLE FUNCTION` /
-- Spark SQL TVF). The engine analyzes this body once with the param
-- bound to a typed NULL, infers the output schema, and emits an
-- explicit `RETURNS TABLE (...)` clause — BigQuery infers TVF schemas
-- implicitly, Spark wants them spelled out.
--
-- Note the WHERE clause references the declared parameter by NAME.
-- (The original project's body had a Jinja templating slip here that
-- compiled the comparison against an empty string; this engine
-- implements the declared intent: a real runtime parameter.)
--
-- `column1` arrives as STRING from the external source and is cast to
-- INT64 (BIGINT) with ANSI error-on-garbage semantics, matching
-- BigQuery's strict CAST. The scalar UDF call below is inlined by the
-- analyzer, so at execution time this whole function is a flat
-- scan -> filter -> project with the equality predicate pushed into
-- the parquet scan.

SELECT
  CAST(column1 AS INT64)              AS column1,
  {{ ref('parse_datetime_demo') }}(column2) AS datetime
FROM {{ source('joshua_dataset', 'test_table') }}
WHERE id = kind
