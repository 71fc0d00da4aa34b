from .checks import (
    array_typed_exchanges,
    explain_str,
    has_broadcast_join,
    has_python_udf,
    pushed_filters,
    shuffle_count,
)
from .metrics import execution_metrics

__all__ = [
    "array_typed_exchanges",
    "explain_str",
    "execution_metrics",
    "has_broadcast_join",
    "has_python_udf",
    "pushed_filters",
    "shuffle_count",
]
