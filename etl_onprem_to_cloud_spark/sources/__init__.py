from .io import (
    Catalog,
    latest_file,
    load_table,
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_parquet,
)

__all__ = [
    "Catalog",
    "latest_file",
    "load_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_csv",
    "write_parquet",
]
