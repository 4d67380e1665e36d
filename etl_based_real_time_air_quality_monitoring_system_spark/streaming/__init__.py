from .pipeline import (
    dead_letter_split,
    dedup_within_watermark,
    enrich,
    run_to_partitioned_parquet,
    stream_json_records,
    windowed_aggregate,
)

__all__ = [
    "dead_letter_split",
    "dedup_within_watermark",
    "enrich",
    "run_to_partitioned_parquet",
    "stream_json_records",
    "windowed_aggregate",
]
