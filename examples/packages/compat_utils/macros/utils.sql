{# dbt_utils.date_spine equivalent: one row per day in [start, end] #}
{% macro date_spine(start_date, end_date) %}
(SELECT explode(sequence(to_date('{{ start_date }}'),
                         to_date('{{ end_date }}'),
                         interval 1 day)) AS date_day)
{% endmacro %}

{# dbt_utils.generate_surrogate_key equivalent: md5 over the coalesced,
   '-'-joined column values (the standard deterministic key recipe) #}
{% macro surrogate_key(cols) %}
md5(concat_ws('-'{% for c in cols %}, coalesce(cast({{ c }} as string), '_null_'){% endfor %}))
{% endmacro %}

{# dbt_utils.safe_divide equivalent: NULL on a zero/NULL denominator #}
{% macro safe_divide(numerator, denominator) %}
({{ numerator }} / nullif({{ denominator }}, 0))
{% endmacro %}

{# dbt_utils.cents_to_dollars #}
{% macro cents_to_dollars(column_name, scale=2) %}
round(({{ column_name }} / 100), {{ scale }})
{% endmacro %}

{# dbt_utils.haversine_distance (km): great-circle distance #}
{% macro haversine_distance(lat1, lon1, lat2, lon2) %}
(2 * 6371 * asin(sqrt(
  pow(sin(radians(({{ lat2 }}) - ({{ lat1 }})) / 2), 2)
  + cos(radians({{ lat1 }})) * cos(radians({{ lat2 }}))
    * pow(sin(radians(({{ lon2 }}) - ({{ lon1 }})) / 2), 2)
)))
{% endmacro %}

{# dbt_utils.not_empty_string generic test #}
{% test not_empty_string(model, column_name) %}
SELECT * FROM {{ model }} WHERE trim({{ column_name }}) = ''
{% endtest %}

{# dbt_utils.at_least_one generic test #}
{% test at_least_one(model, column_name) %}
SELECT 1 AS violation FROM {{ model }}
HAVING count({{ column_name }}) = 0
{% endtest %}
