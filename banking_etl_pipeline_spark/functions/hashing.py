"""Deterministic cross-engine hashing primitives.

All dedup/LSH operators need hash functions that produce IDENTICAL values in
Spark and in the DuckDB oracle. Engine-native hashes (Spark xxhash64/hash,
DuckDB hash) differ, so everything is derived from md5 — available and
bit-identical in both engines: take the first 15 hex digits (60 bits, always
positive in an int64) of md5(seed ':' value).

Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE = 1_000_000_007
TOKEN_MOD = 1_000_003


def md5_long(col: Column) -> Column:
    """60-bit positive integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_seeded(seed: int, col: Column) -> Column:
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def sql_md5_long(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_md5_long_seeded(seed: int, expr: str) -> str:
    return sql_md5_long(f"'{seed}:' || ({expr})")
