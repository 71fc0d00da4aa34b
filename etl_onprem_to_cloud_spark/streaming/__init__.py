from .joins import (
    click_purchase_attribution_outer,
    click_purchase_attribution_stream,
)
from .windows import (
    HAS_TWS,
    session_window_agg,
    stream_dedup,
    stream_static_enrich,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
    user_running_totals_stateful,
    user_running_totals_tws,
)

__all__ = [
    "HAS_TWS",
    "click_purchase_attribution_outer",
    "click_purchase_attribution_stream",
    "session_window_agg",
    "stream_dedup",
    "stream_static_enrich",
    "sliding_window_agg",
    "stream_events",
    "tumbling_window_agg",
    "user_running_totals_stateful",
    "user_running_totals_tws",
]
