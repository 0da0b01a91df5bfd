from .readers import read_csv_declared, read_csv_inferred, read_parquet, table
from .sinks import write_single_csv

__all__ = [
    "read_csv_declared",
    "read_csv_inferred",
    "read_parquet",
    "table",
    "write_single_csv",
]
