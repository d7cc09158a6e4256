from .writers import (  # noqa: F401
    ParquetWarehouse,
    merge_upsert,
    write_csv,
    write_delta,
    write_jdbc,
    write_partitioned,
)
