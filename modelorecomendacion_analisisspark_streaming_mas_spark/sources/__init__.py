from .readers import (
    TABLES,
    load_table,
    load_tables,
    read_dat,
    read_csv_inferred,
    read_parquet,
    write_parquet,
    write_head_csv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_dat",
    "read_csv_inferred",
    "read_parquet",
    "write_parquet",
    "write_head_csv",
]
