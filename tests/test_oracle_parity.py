"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local version of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from banking_etl_pipeline_spark.registry import all_queries

from .oracle_compare import compare, duck_connection

_QUERIES = all_queries()
_ORACLE_KEYS = [k for k, s in _QUERIES.items() if s.oracle is not None]
_ROWS_ONLY_KEYS = [k for k, s in _QUERIES.items() if s.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("key", _ORACLE_KEYS)
def test_oracle_parity(key, spark, sf_dir, con):
    spec = _QUERIES[key]
    df = spec.build(spark, sf_dir)
    res = compare(df, con, spec.oracle)
    assert res["row_count_match"], f"{key}: {res}"
    assert res["columns_match"], f"{key}: {res}"
    assert res["values_match"], f"{key}: {res}"


def test_compare_rejects_array_outputs(spark, sf_dir, con):
    """Driver-canonicalizer contract: a top-level array/map output column
    crashes the driver's pandas sort (unhashable 'list'), so compare() must
    reject it before the tuple-izing local comparison can mask the class
    (the round-3 embedding_quantize / multimodal_features failure mode)."""
    df = spark.createDataFrame([(1, [1, 2])], "id int, xs array<int>")
    with pytest.raises(AssertionError, match="array/map"):
        compare(df, con, "SELECT 1 AS id, [1, 2] AS xs")


@pytest.mark.parametrize("key", _ROWS_ONLY_KEYS)
def test_rows_only_smoke(key, spark, sf_dir):
    df = _QUERIES[key].build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
