"""Checkpoint-restart recovery: a streaming aggregation stopped mid-feed and
restarted from its checkpoint must (a) not double-count data it already
processed (file-source progress is in the checkpoint) and (b) pick up files
that arrived while it was down — the exactly-once operational contract an
incremental 100 TB/day pipeline depends on."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.sinks.writers import ParquetWarehouse
from banking_etl_pipeline_spark.streaming.upsert import start_streaming_upsert
from tests.conftest import SF_SMALL

_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _stream_agg(spark, src_dir):
    raw = (
        spark.readStream.schema(_SCHEMA)
        .format("parquet")
        .option("path", src_dir)
        .load()
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return raw.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    events = table(spark, SF_SMALL, "events")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)

    src = tmp_path / "src"
    stage1 = tmp_path / "stage1"
    stage2 = tmp_path / "stage2"
    half1.coalesce(1).write.parquet(str(stage1))
    half2.coalesce(1).write.parquet(str(stage2))
    src.mkdir()
    for f in stage1.glob("*.parquet"):
        shutil.copy(f, src / "a.parquet")

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # run 1: only the first half visible
    q = start_streaming_upsert(
        _stream_agg(spark, str(src)), wh, "user_stats", ["user_id"], ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the second half lands while the query is DOWN
    for f in stage2.glob("*.parquet"):
        shutil.copy(f, src / "b.parquet")

    # run 2: restart from the same checkpoint
    q = start_streaming_upsert(
        _stream_agg(spark, str(src)), wh, "user_stats", ["user_id"], ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )
    got = {r.user_id: (r.n, round(r.sum_value, 6))
           for r in wh.read("user_stats").collect()}
    want = {r.user_id: (r.n, round(r.sum_value, 6)) for r in batch.collect()}
    assert got == want  # no double-count of half 1, no loss of half 2
