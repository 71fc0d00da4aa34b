from .joins import broadcast_dim_join, star_join
from .ranks import blocked_global_ntile, blocked_running, range_block
from .topk import global_top_k, top_k_per_group

__all__ = [
    "blocked_global_ntile",
    "blocked_running",
    "range_block",
    "broadcast_dim_join",
    "star_join",
    "global_top_k",
    "top_k_per_group",
]
