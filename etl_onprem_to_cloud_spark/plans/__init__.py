from .checks import (
    explain_str,
    has_broadcast_join,
    has_python_udf,
    pushed_filters,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_python_udf",
    "pushed_filters",
    "shuffle_count",
]
