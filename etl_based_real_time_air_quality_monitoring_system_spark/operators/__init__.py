from .aggregates import (
    count_distinct,
    freq_distribution,
    global_means,
    grouped_stats,
    multikey_summary,
    range_aggregate,
    time_bucketed,
)
from .cleaning import drop_null_rows, exact_dedup, fill_defaults
from .topk import latest_per_key, top_k

__all__ = [
    "count_distinct",
    "freq_distribution",
    "global_means",
    "grouped_stats",
    "multikey_summary",
    "range_aggregate",
    "time_bucketed",
    "drop_null_rows",
    "exact_dedup",
    "fill_defaults",
    "latest_per_key",
    "top_k",
]
