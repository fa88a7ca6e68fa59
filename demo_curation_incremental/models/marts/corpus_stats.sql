-- Cumulative corpus report over every ingested day's despanned
-- survivors: per-language doc counts and token mass.  Rebuilt each
-- build (table): the aggregate is vocabulary-sized, so the rebuild is
-- one map-side-combined pass; at a scale where even that pass hurts,
-- materialize it incrementally from per-day partial aggregates.
select
    lang,
    count(*)                       as n_docs,
    cast(sum(n_tokens)  as bigint) as total_tokens,
    cast(sum(n_removed) as bigint) as removed_tokens,
    round(avg(n_tokens), 4)        as avg_tokens
from {{ ref('docs_despanned') }}
group by lang
