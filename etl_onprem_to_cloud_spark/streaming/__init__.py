from .windows import (
    session_window_agg,
    stream_dedup,
    stream_static_enrich,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
    user_running_totals_stateful,
)

__all__ = [
    "session_window_agg",
    "stream_dedup",
    "stream_static_enrich",
    "sliding_window_agg",
    "stream_events",
    "tumbling_window_agg",
    "user_running_totals_stateful",
]
