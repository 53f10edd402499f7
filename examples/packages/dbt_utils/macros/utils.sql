{# dbt_utils.date_spine: one row per `datepart` step in
   [start_date, end_date) — end-exclusive, column named date_<part>,
   matching the hub macro's contract. Spark-native: sequence() +
   explode() instead of a recursive CTE / generated numbers table. #}
{% macro date_spine(datepart, start_date, end_date) %}
(SELECT s AS date_{{ datepart }}
 FROM (SELECT explode(sequence(cast({{ start_date }} AS timestamp),
                               cast({{ end_date }} AS timestamp),
                               interval 1 {{ datepart }})) AS s)
 WHERE s < cast({{ end_date }} AS timestamp))
{% endmacro %}

{# dbt_utils.generate_surrogate_key: md5 over '-'-joined, null-coalesced
   stringified fields — the deterministic-key recipe. #}
{% macro generate_surrogate_key(field_list) %}
md5(concat_ws('-'{% for f in field_list %}, coalesce(cast({{ f }} AS string), '_dbt_utils_surrogate_key_null_'){% endfor %}))
{% endmacro %}

{# dbt_utils.safe_divide: NULL instead of error on zero/NULL denominator #}
{% macro safe_divide(numerator, denominator) %}
({{ numerator }} / nullif({{ denominator }}, 0))
{% endmacro %}

{# dbt_utils.dateadd (cross-db shim upstream; Spark has it natively) #}
{% macro dateadd(datepart, interval, from_date_or_timestamp) %}
timestampadd({{ datepart }}, {{ interval }}, {{ from_date_or_timestamp }})
{% endmacro %}

{# dbt_utils.datediff — note the hub's (first, second, part) arg order #}
{% macro datediff(first_date, second_date, datepart) %}
timestampdiff({{ datepart }}, {{ first_date }}, {{ second_date }})
{% endmacro %}

{# dbt_utils.split_part (1-based; Spark's split_part matches) #}
{% macro split_part(string_text, delimiter_text, part_number) %}
split_part({{ string_text }}, {{ delimiter_text }}, {{ part_number }})
{% endmacro %}

{# dbt_utils.last_day: last calendar day of the month/quarter/year
   containing `date`. date_trunc to the period start, step one period,
   back one day. #}
{% macro last_day(date, datepart) %}
date_sub(cast(date_trunc('{{ datepart }}', {{ date }}) + interval 1 {{ datepart }} AS date), 1)
{% endmacro %}

{# dbt_utils.hash: stable one-column digest #}
{% macro hash(field) %}
md5(cast({{ field }} AS string))
{% endmacro %}

{# dbt_utils.safe_cast: NULL on cast failure (Spark try_cast) #}
{% macro safe_cast(field, type) %}
try_cast({{ field }} AS {{ type }})
{% endmacro %}

{# dbt_utils.cents_to_dollars #}
{% macro cents_to_dollars(column_name, scale=2) %}
round(({{ column_name }} / 100), {{ scale }})
{% endmacro %}

{# dbt_utils.deduplicate: keep the first row per partition_by under
   order_by. QUALIFY-free form so it works as a plain subquery; the
   helper rank column is dropped with Spark's `* EXCEPT`. #}
{% macro deduplicate(relation, partition_by, order_by) %}
(SELECT * EXCEPT (_dbt_utils_rn) FROM
  (SELECT *, row_number() OVER (PARTITION BY {{ partition_by }}
                                ORDER BY {{ order_by }}) AS _dbt_utils_rn
   FROM {{ relation }})
 WHERE _dbt_utils_rn = 1)
{% endmacro %}

{# dbt_utils.accepted_range generic test: rows outside [min, max] #}
{% test accepted_range(model, column_name, min_value, max_value) %}
SELECT * FROM {{ model }}
WHERE {{ column_name }} < {{ min_value }} OR {{ column_name }} > {{ max_value }}
{% endtest %}

{# dbt_utils.not_constant generic test: fails when every row holds one
   distinct value (a broken join/filter signature) #}
{% test not_constant(model, column_name) %}
SELECT count(DISTINCT {{ column_name }}) AS n FROM {{ model }}
HAVING count(DISTINCT {{ column_name }}) = 1
{% endtest %}

{# dbt_utils.expression_is_true generic test: rows where the expression
   does not hold. Upstream uses `where not(expression)`, under which a
   NULL-valued expression filters OUT (NULL passes the test) — matched
   exactly here (ADVICE r9: the earlier coalesce(.., false) silently
   failed NULL rows, a stricter deviation from dbt_utils) #}
{% test expression_is_true(model, expression) %}
SELECT * FROM {{ model }}
WHERE NOT ({{ expression }})
{% endtest %}

{# dbt_utils.unique_combination_of_columns generic test: combinations
   appearing more than once #}
{% test unique_combination_of_columns(model, combination_of_columns) %}
SELECT {% for c in combination_of_columns %}{{ c }}, {% endfor %}count(*) AS n
FROM {{ model }}
GROUP BY {% for c in combination_of_columns %}{{ c }}{% if not loop.last %}, {% endif %}{% endfor %}
HAVING count(*) > 1
{% endtest %}
