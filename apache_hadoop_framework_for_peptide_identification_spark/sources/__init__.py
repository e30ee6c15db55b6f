from .readers import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_json,
    read_parquet,
    read_text,
    write_csv,
    write_json,
    write_parquet,
)
