from .inspect import (
    codegen_spans_noaqe,
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "codegen_spans_noaqe",
    "explain_str",
    "has_broadcast_join",
    "partition_filters",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "wholestage_codegen_spans",
]
