"""Empty-input robustness: every batch query must run (not crash) over a
universe of EMPTY tables with the production schemas.

At 100 TB empty inputs are routine — a partition with no files after
pruning, a day with no events, a filter that eliminates everything.
Operators that divide, take percentiles, explode sequences, or join
broadcast singletons are exactly where an empty input turns into a
runtime error (division by zero on an empty aggregate, max() returning
null into arithmetic). This suite pins: schema preserved, zero-or-more
rows, no exception. Streaming queries are excluded (the parquet replay
source requires at least one file footer) as is the seeded banking
pipeline (generates its own input).
"""

from __future__ import annotations

import os

import pytest

from banking_etl_pipeline_spark.catalog import TABLES, table
from banking_etl_pipeline_spark.registry import all_queries

_EMPTY_DIR = "/tmp/banking_etl_pipeline_spark_empty"

_SKIP = {"banking_txn_pipeline"}  # self-seeding; no table inputs


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir):
    from tests.conftest import build_empty_universe

    return build_empty_universe(spark, sf_dir, _EMPTY_DIR)


_KEYS = [
    k for k in all_queries()
    if not k.startswith("streaming_") and k not in _SKIP
]


@pytest.mark.parametrize("key", _KEYS)
def test_runs_on_empty_universe(key, spark, empty_dir):
    spec = all_queries()[key]
    df = spec.build(spark, empty_dir)
    assert len(df.schema) > 0
    assert df.count() >= 0
