-- The day's crawl: an id-range slice of the raw corpus standing in
-- for the day's arrival partition (view: zero storage, inlined by
-- Catalyst so the range predicate pushes into the parquet scan of
-- every downstream stage).  NULL text is filtered at the door — the
-- digest tier's fold invariant requires it upstream
-- (operators/dedup.py:append_digest_index).
select
    doc_id,
    text,
    lang,
    source,
    n_chars
from {{ source('raw', 'documents') }}
where text is not null
  and doc_id >= {{ var('day_lo') }}
  and doc_id < {{ var('day_hi') }}
