"""The incremental streaming→warehouse upsert must converge to the batch
aggregate of the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.sinks.writers import ParquetWarehouse
from banking_etl_pipeline_spark.streaming.upsert import start_streaming_upsert
from banking_etl_pipeline_spark.streaming.windows import _events_stream
from tests.conftest import SF_SMALL


def test_streaming_upsert_converges_to_batch(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    agg = (
        _events_stream(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
    )
    q = start_streaming_upsert(agg, wh, "user_stats", ["user_id"],
                               str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = (
        table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
    )
    got = {r.user_id: (r.n, round(r.sum_value, 6))
           for r in wh.read("user_stats").collect()}
    want = {r.user_id: (r.n, round(r.sum_value, 6)) for r in batch.collect()}
    assert got == want
