from .readers import read_csv, read_delta, read_jdbc, read_parquet, read_text  # noqa: F401
