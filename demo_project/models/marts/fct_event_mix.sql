-- Consumes the EPHEMERAL event-type dimension (inlined CTE) against
-- the daily rollup: share of each type per total events.
select
    t.event_type,
    coalesce(sum(d.n_events), 0) as n_events
from {{ ref('stg_event_types') }} t
left join {{ ref('fct_events_daily') }} d
  on d.event_type = t.event_type
group by t.event_type
