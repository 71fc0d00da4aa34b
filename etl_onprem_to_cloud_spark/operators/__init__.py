from .joins import broadcast_dim_join, star_join
from .topk import global_top_k, top_k_per_group

__all__ = ["broadcast_dim_join", "star_join", "global_top_k", "top_k_per_group"]
