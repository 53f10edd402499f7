-- Materialized consumer of the table function: `+materialized: table`
-- comes from the datamart folder's config tree (dbt_project.yml), so
-- this file is nothing but the query — the reference's datamart model
-- works the same way.
--
-- The TVF is invoked as a relation with a literal argument. Spark
-- requires persistent TVF calls to be UNQUALIFIED, so the engine
-- routes the call through the current database (`USE <db>`), which is
-- also how per-environment dataset switching works. The stand-in
-- source keys rows by event type, hence the 'click' argument.

SELECT
  column1,
  datetime
FROM {{ ref('rows_of_kind') }}('click')
