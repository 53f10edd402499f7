{{
    config(
        params=['timestamp_expression STRING'],
        return_type='DATETIME'
    )
}}

-- Multi-format datetime parser, written in BigQuery dialect on purpose:
-- this example demonstrates that a dbt-bigquery model body works as-is.
-- The engine's dialect layer rewrites SAFE.PARSE_DATETIME to Spark's
-- try_to_timestamp (NULL on mismatch), translates each %-format to a
-- DateTimeFormatter pattern, and casts the result to TIMESTAMP_NTZ —
-- BigQuery's timezone-less DATETIME.
--
-- Fallback-chain contract (order matters, COALESCE is lazy):
--   slash datetime -> slash date -> dash datetime -> dash date ->
--   ISO-8601 with fractional seconds and Z -> STRICT slash datetime.
-- The final branch is deliberately NOT SAFE-prefixed: input matching
-- no format must raise, not become NULL silently.

COALESCE(
  SAFE.PARSE_DATETIME('%Y/%m/%d %H:%M:%S', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y/%m/%d',          timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%d %H:%M:%S', timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%d',          timestamp_expression),
  SAFE.PARSE_DATETIME('%Y-%m-%dT%H:%M:%E*SZ', timestamp_expression),
  PARSE_DATETIME('%Y/%m/%d %H:%M:%S', timestamp_expression)
)
