-- Staging view over the raw corpus: stable column surface for the
-- curation stages (view materialization: zero storage, inlined by
-- Catalyst into every downstream plan).
select
    doc_id,
    text,
    lang,
    source,
    n_chars
from {{ source('raw', 'documents') }}
