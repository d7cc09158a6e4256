"""Physical-plan introspection helpers.

The engine's optimizer IS Catalyst (SURVEY.md §4 — the reference has no
optimizer of its own, and nothing here needs a custom rule). What the engine
owns instead is *plan hygiene*: asserting that the declarative queries
actually compile to the plans that survive scale — filters pushed into
scans, pruned read schemas, broadcast dim joins, codegen'd aggregates.
These helpers extract those facts; tests/test_plans.py pins them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The query's explain output as a string (modes: simple, extended,
    formatted, codegen, cost). Mirrors df.explain(), which only prints."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for pushdown, one list per scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_of(df))


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — what actually gets decoded from parquet."""
    return re.findall(r"ReadSchema: (\S+)", plan_of(df))
