{{ config(
    materialized='incremental',
    incremental_strategy='merge',
    unique_key=['event_date', 'event_type']
) }}

-- Incremental daily rollup (north-star events extension; SURVEY §7.3
-- step 4).  On an incremental run only days at/after the current
-- high-water mark are recomputed and merged — at 100 TB the source
-- scan prunes to recent partitions instead of full history.
select
    date(ts) as event_date,
    event_type,
    count(*) as n_events,
    cast(round(sum(cast(value as decimal(18,2))), 2) as double) as total_value
from {{ source('raw', 'events') }}
{% if is_incremental() %}
where date(ts) >= (
    select max(event_date) from {{ this }}
)
{% endif %}
group by 1, 2
