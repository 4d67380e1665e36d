from .pipeline import (
    dead_letter_split,
    dedup_within_watermark,
    enrich,
    rate_source,
    run_to_partitioned_parquet,
    stream_json_records,
    windowed_aggregate,
    with_ingest_metrics,
)

__all__ = [
    "dead_letter_split",
    "dedup_within_watermark",
    "enrich",
    "rate_source",
    "run_to_partitioned_parquet",
    "stream_json_records",
    "windowed_aggregate",
    "with_ingest_metrics",
]
