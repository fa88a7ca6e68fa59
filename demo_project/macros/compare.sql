{#- dev↔prod data-diff macro: the engine-native re-expression of the
    reference's macros/compare_dev_prod.sql:1-183 (dev_prod_diff).
    Counts both sides, EXCEPT DISTINCT both directions, bounded sample,
    parseable SUMMARY| line (consumed downstream like
    scripts/pr_data_diff.sh:94-118). -#}
{% macro dev_prod_diff(table, dev_schema, prod_schema, limit=100) %}
  {% set dev_rel = dev_schema ~ '.' ~ table %}
  {% set prod_rel = prod_schema ~ '.' ~ table %}
  {% set counts = run_query(
      'SELECT (SELECT count(*) FROM ' ~ dev_rel ~ ') AS dev_count, '
      ~ '(SELECT count(*) FROM ' ~ prod_rel ~ ') AS prod_count, '
      ~ '(SELECT count(*) FROM (SELECT * FROM ' ~ dev_rel
      ~ ' EXCEPT SELECT * FROM ' ~ prod_rel ~ ')) AS dev_not_in_prod, '
      ~ '(SELECT count(*) FROM (SELECT * FROM ' ~ prod_rel
      ~ ' EXCEPT SELECT * FROM ' ~ dev_rel ~ ')) AS prod_not_in_dev'
  ) %}
  {% set row = counts.rows[0] %}
  {{ log('SUMMARY|table=' ~ table ~ '|dev=' ~ row[0] ~ '|prod=' ~ row[1]
         ~ '|dev_not_in_prod=' ~ row[2] ~ '|prod_not_in_dev=' ~ row[3]) }}
  {% if row[2] > 0 or row[3] > 0 %}
    {% set sample = run_query(
        "SELECT 'in_dev_not_in_prod' AS diff_type, * FROM (SELECT * FROM "
        ~ dev_rel ~ " EXCEPT SELECT * FROM " ~ prod_rel ~ ") UNION ALL "
        ~ "SELECT 'in_prod_not_in_dev' AS diff_type, * FROM (SELECT * FROM "
        ~ prod_rel ~ " EXCEPT SELECT * FROM " ~ dev_rel ~ ") LIMIT " ~ limit
    ) %}
    {% for r in sample.rows %}
      {{ log('DIFF|' ~ r | join('|')) }}
    {% endfor %}
  {% endif %}
{% endmacro %}

{#- simple scalar macro available inside models -#}
{% macro bucketize(col, threshold) %}
  case when {{ col }} > {{ threshold }} then 'high' else 'regular' end
{% endmacro %}
