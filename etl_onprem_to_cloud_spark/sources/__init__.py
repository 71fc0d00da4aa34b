from .io import (
    Catalog,
    latest_file,
    load_table,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    write_csv,
    write_parquet,
    write_text,
)

__all__ = [
    "Catalog",
    "latest_file",
    "load_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_text",
    "write_csv",
    "write_parquet",
    "write_text",
]
