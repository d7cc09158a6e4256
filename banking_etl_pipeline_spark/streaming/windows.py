"""Structured Streaming window metrics over the `events` stream table
(SURVEY.md §2.9: the reference is batch-only; its date-partitioned Delta
append is the batch half of an incremental pipeline — this module is the
streaming half, same aggregates expressed over readStream).

Local test harness: the parquet directory is replayed through
`spark.readStream` with an explicit schema (one-file micro-batch), driven to
completion synchronously with `processAllAvailable`, and the memory-sink
table is returned as a normal DataFrame — so streaming queries plug into the
same oracle comparison as batch ones.

At scale the same code runs against a Kafka/file source with watermarking;
state size is bounded by (windows × event_types), not by input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..spec import QuerySpec

# events.parquet carries TIMESTAMP(MICROS, isAdjustedToUTC=false); declare it
# NTZ and cast to a plain timestamp (session TZ is UTC → epoch-identity),
# exactly like catalog.table does for batch.
EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same UTC self-heal as catalog.table — the driver may own the session
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", sf_dir)
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_completion(result: DataFrame, name: str) -> None:
    q = (
        result.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts + exact cents sums per event type."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )
    name = "stream_hourly_counts"
    _run_to_completion(agg, name)
    return spark.table(name).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )


STREAMING_HOURLY_COUNTS_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h-window/1h-slide counts: each event lands in exactly two
    hour-aligned windows. The oracle enumerates those two window starts per
    event (unnest of [trunc(ts), trunc(ts) - 1h]) and re-aggregates — exact."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "stream_sliding_counts"
    _run_to_completion(agg, name)
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )


STREAMING_SLIDING_COUNTS_SQL = """
WITH w AS (
  SELECT event_type,
         unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
             AS window_start
  FROM events
)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY window_start, event_type
"""


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: every event is duplicated in-flight
    (exploded ×2 — simulating at-least-once delivery from a replayed
    source), then `dropDuplicatesWithinWatermark` keeps one row per
    event_id. Unlike plain dropDuplicates, the watermark EVICTS dedup state
    for keys older than the lateness bound — state is O(events per
    watermark horizon), not O(all events ever seen), which is what makes
    exact streaming dedup viable on an unbounded 100 TB/day feed. The
    memory-sink result is then rolled up per event type so the batch oracle
    (a plain per-type count of the unique events) can check it."""
    dup = (
        _events_stream(spark, sf_dir)
        .withColumn("copy", F.explode(F.array(F.lit(1), F.lit(2))))
        .drop("copy")
    )
    deduped = dup.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "stream_dedup"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        .orderBy("event_type")
    )


STREAMING_DEDUP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def streaming_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-3 by count within each sliding 2h window.

    Ranking over a streaming aggregate is not expressible inside the stream
    (append mode can't rank complete windows) — the idiomatic split is
    stream → windowed counts (bounded state) → rank in the serving layer
    over the materialized result, which is exactly what this does: the
    memory-sink table is the serving table, then one batch row_number per
    window. At scale the sink is a Delta table and the rank is the reader's
    query — same two plans."""
    from pyspark.sql import Window

    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "stream_trending"
    _run_to_completion(agg, name)
    t = spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        t.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


STREAMING_TRENDING_SQL = """
WITH w AS (
  SELECT event_type,
         unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
             AS window_start
  FROM events
),
c AS (
  SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY window_start, event_type
)
SELECT window_start, event_type, n,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                               ORDER BY n DESC, event_type) AS rank
  FROM c
)
WHERE rank <= 3
"""


SQ_BUCKETS = 256
SQ_VMAX_C = 60_000  # fixed domain bound (value ≤ 600.00): streaming sketches
#                     can't do a min/max pre-pass — the domain is declared


def streaming_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed median over a stream via the mergeable HISTOGRAM sketch
    (`skew.py::quantile_sketch`'s streaming form): state per 6-hour
    window is ≤256 integer bucket counts — a quantile over a stream
    cannot keep raw values (unbounded state), and rank sketches don't
    have an exact-verification story; the fixed-domain histogram has
    both. The streaming aggregate maintains (window, bucket) counts
    (watermark evicts closed windows at production scale); the serving
    epilogue — cumulative walk + interpolation — runs batch-side on the
    sink table, same split as `streaming_trending`'s rank. Bounds are
    DECLARED (domain knowledge), not measured: the one structural
    difference from the batch sketch, and why the bucket expression
    clamps."""
    vc = cents(F.col("value"))
    bucket = F.least(
        F.lit(SQ_BUCKETS - 1),
        F.floor(vc * SQ_BUCKETS / (SQ_VMAX_C + 1)),
    )
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "6 hours").alias("w"), bucket.alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = "stream_quantile"
    _run_to_completion(agg, name)
    sink = spark.table(name).select(
        F.col("w.start").alias("window_start"), "bucket", "cnt"
    )
    from pyspark.sql import Window as W

    wcum = (
        W.partitionBy("window_start")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        sink.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
    )
    totals = sink.groupBy("window_start").agg(F.sum("cnt").alias("n"))
    width = (SQ_VMAX_C + 1) / SQ_BUCKETS
    joined = cum.join(totals, "window_start").withColumn(
        "target", F.floor((F.lit(50) * F.col("n") + 99) / 100)
    )
    est = (
        F.col("bucket") * F.lit(float(width))
        + (F.col("target") - F.col("prev")).cast("double") / F.col("cnt")
        * F.lit(float(width))
    )
    from ..functions.numeric import ftrunc

    return joined.filter(
        (F.col("prev") < F.col("target")) & (F.col("cum") >= F.col("target"))
    ).select(
        "window_start",
        "n",
        "target",
        "bucket",
        ftrunc(est / 100.0, 4).alias("p50_estimate"),
    )


STREAMING_QUANTILE_SQL = f"""
WITH b AS (
  SELECT date_trunc('hour', ts) - INTERVAL (CAST(EXTRACT(hour FROM ts) AS INTEGER) % 6) HOUR
             AS window_start,
         LEAST({SQ_BUCKETS - 1},
               CAST(FLOOR(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                          * {SQ_BUCKETS} / {SQ_VMAX_C + 1}) AS BIGINT)) AS bucket
  FROM events
),
counts AS (
  SELECT window_start, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY window_start, bucket
),
cum AS (
  SELECT window_start, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY window_start ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum
  FROM counts
),
totals AS (
  SELECT window_start, CAST(SUM(cnt) AS BIGINT) AS n
  FROM counts GROUP BY window_start
)
SELECT c.window_start, t.n,
       CAST(FLOOR((50 * t.n + 99) / 100) AS BIGINT) AS target,
       c.bucket,
       FLOOR((c.bucket * {float((SQ_VMAX_C + 1) / SQ_BUCKETS)!r}
              + CAST(CAST(FLOOR((50 * t.n + 99) / 100) AS BIGINT)
                     - (c.cum - c.cnt) AS DOUBLE) / c.cnt
                * {float((SQ_VMAX_C + 1) / SQ_BUCKETS)!r})
             / 100.0 * 10000.0) / 10000.0 AS p50_estimate
FROM cum c JOIN totals t ON c.window_start = t.window_start
WHERE (c.cum - c.cnt) < CAST(FLOOR((50 * t.n + 99) / 100) AS BIGINT)
  AND c.cum >= CAST(FLOOR((50 * t.n + 99) / 100) AS BIGINT)
"""


QUERIES: dict[str, QuerySpec] = {
    "streaming_quantile": QuerySpec(
        streaming_quantile, STREAMING_QUANTILE_SQL,
        "windowed p50 from streaming histogram sketch + batch serve walk",
    ),
    "streaming_trending": QuerySpec(
        streaming_trending, STREAMING_TRENDING_SQL,
        "top-3 trending event types per sliding window (stream + serve-rank)",
    ),
    "streaming_hourly_counts": QuerySpec(
        streaming_hourly_counts, STREAMING_HOURLY_COUNTS_SQL,
        "Structured Streaming tumbling-window aggregate",
    ),
    "streaming_sliding_counts": QuerySpec(
        streaming_sliding_counts, STREAMING_SLIDING_COUNTS_SQL,
        "Structured Streaming sliding-window counts",
    ),
    "streaming_dedup": QuerySpec(
        streaming_dedup, STREAMING_DEDUP_SQL,
        "watermark-bounded streaming exact dedup of duplicated feed",
    ),
}
