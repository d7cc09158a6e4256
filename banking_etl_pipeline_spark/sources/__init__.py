from .readers import (  # noqa: F401
    read_csv,
    read_delta,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
