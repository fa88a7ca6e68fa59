{{ config(
    materialized='table',
    partition_by={'field': 'created_at_ts', 'data_type': 'timestamp', 'granularity': 'month'},
    cluster_by=['id']
) }}

-- Mart fact (reference models/marts/fct_example.sql:1-14): CASE bucket
-- over the staged model; day-partitioned + clustered sink (S6/S7).
select
    id,
    value,
    created_at_ts,
    {{ bucketize('value', var('high_value_threshold', 100)) }} as bucket
from {{ ref('stg_example') }}
