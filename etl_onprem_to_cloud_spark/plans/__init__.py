from .checks import (
    CORPUS_TABLES,
    array_typed_exchanges,
    corpus_broadcast_hints,
    explain_str,
    has_broadcast_join,
    has_python_udf,
    keyed_agg_suspects,
    pushed_filters,
    shuffle_count,
    string_buffer_agg_suspects,
    suspect_group_count,
    unpartitioned_corpus_windows,
    unresolved_corpus_leaves,
)
from .metrics import execution_metrics

__all__ = [
    "CORPUS_TABLES",
    "array_typed_exchanges",
    "corpus_broadcast_hints",
    "explain_str",
    "execution_metrics",
    "has_broadcast_join",
    "has_python_udf",
    "keyed_agg_suspects",
    "pushed_filters",
    "shuffle_count",
    "string_buffer_agg_suspects",
    "suspect_group_count",
    "unpartitioned_corpus_windows",
    "unresolved_corpus_leaves",
]
