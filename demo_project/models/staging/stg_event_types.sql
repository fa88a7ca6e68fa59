{{ config(materialized='ephemeral') }}

-- Ephemeral helper (dbt core semantics): inlined as a CTE into every
-- consumer, never materialized — the dimension is tiny and derived.
select distinct event_type from {{ source('raw', 'events') }}
