from .readers import load_table, read_json_enforced, read_json_inferred, read_parquet
from .writers import write_partitioned_parquet, write_single_csv

__all__ = [
    "load_table",
    "read_json_enforced",
    "read_json_inferred",
    "read_parquet",
    "write_partitioned_parquet",
    "write_single_csv",
]
