from .jobs import (
    click_purchase_stream_join,
    cms_sketch_stream,
    enrich_stream_static,
    incremental_dedup_stream,
    dedup_stream,
    running_user_totals_stream,
    running_user_totals_tws,
    read_events_stream,
    session_stream,
    sliding_stream,
    tumbling_stream,
    upsert_outcomes_foreach_batch,
)

__all__ = [
    "click_purchase_stream_join",
    "cms_sketch_stream",
    "enrich_stream_static",
    "incremental_dedup_stream",
    "dedup_stream",
    "running_user_totals_stream",
    "running_user_totals_tws",
    "read_events_stream",
    "session_stream",
    "sliding_stream",
    "tumbling_stream",
    "upsert_outcomes_foreach_batch",
]
