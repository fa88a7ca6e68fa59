{{ config(
    unique_key='id',
    strategy='timestamp',
    updated_at='created_at_ts'
) }}

-- SCD2 snapshot of the staged feed (reference
-- snapshots/example_snapshot.sql:1-12).
select * from {{ ref('stg_example') }}
