-- Corpus mixture dashboard: per-language survivor counts and retention
-- vs the raw feed (SQL model over two refs; the aggregate is
-- vocabulary-small, Catalyst plans a partial/final hash aggregate).
select
    s.lang,
    count(*) as n_docs,
    count(distinct s.source) as n_sources,
    round(count(*) / cast(r.n_raw as double), 6) as retention
from {{ ref('corpus_shards') }} s
join (
    select lang, count(*) as n_raw
    from {{ ref('stg_documents') }}
    group by lang
) r using (lang)
group by s.lang, r.n_raw
