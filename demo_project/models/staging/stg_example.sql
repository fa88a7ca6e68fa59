{{ config(materialized='view') }}

-- Staged raw feed (reference models/staging/stg_example.sql:1-10):
-- rename, cast string→timestamp, NUMERIC-parity decimal.
select
    o_orderkey as id,
    cast(cast(o_orderdate as string) as timestamp) as created_at_ts,
    cast(o_totalprice as decimal(38,9)) as value
from {{ source('raw', 'example') }}
