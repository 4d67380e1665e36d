from .aggregates import (
    count_distinct,
    freq_distribution,
    global_means,
    grouped_stats,
    multikey_summary,
    range_aggregate,
    time_bucketed,
)
from .balance import spread_small_input
from .cdc import merge_upsert, point_in_time_join, scd2_history
from .cleaning import drop_null_rows, exact_dedup, fill_defaults
from .topk import latest_per_key, top_k

__all__ = [
    "spread_small_input",
    "merge_upsert",
    "point_in_time_join",
    "scd2_history",
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
