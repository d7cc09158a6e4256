"""Stateful Structured Streaming operators over the `events` stream.

Three shapes a production stream pipeline needs beyond plain windowed
aggregation (streaming/windows.py):

- session windows (`F.session_window`) — gap-based sessionization inside the
  streaming engine; state per (user, open session), closed sessions emitted
  by the engine;
- a CUSTOM stateful operator via `applyInPandasWithState` — per-user running
  profile (count, exact cents sum, max inter-event gap) carried in explicit
  GroupState across micro-batches: the escape hatch for semantics windowed
  aggregation can't express (Arrow-batched, one state row per key);
- stream-static join — the streaming fact side joined to a static broadcast
  dimension, the streaming analog of the batch dim⋈fact star
  (operators/analytics.py).

Test harness as in streaming/windows.py: parquet replay → memory sink →
returned as a batch DataFrame so the DuckDB oracle applies. The parquet
source replays as one micro-batch here, which makes the custom operator's
cross-batch arrival-order caveat moot in tests; within each batch the
operator sorts its chunk by timestamp, so state transitions are
deterministic.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..spec import QuerySpec
from .windows import _events_stream, _run_to_completion

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

SESSION_GAP_MIN = 30


def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user through F.session_window.

    Complete output mode: every batch re-emits all sessions, so the memory
    sink holds the closed-form result without watermark-flush timing issues
    (at production scale: append mode + watermark bounds state instead).
    """
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )
    name = "stream_session_stats"
    _run_to_completion(agg, name)
    return spark.table(name).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


# DuckDB oracle: lag-based session islands; session end = last event + gap
STREAMING_SESSION_STATS_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
islands AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_value
FROM islands
GROUP BY user_id, session_id
"""


_PROFILE_OUT = (
    "user_id long, n_events long, sum_value_cents long, max_gap_us long"
)
_PROFILE_STATE = "n long, sum_cents long, last_ts_us long, max_gap_us long"


def _update_profile(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: "GroupState") -> Iterator[pd.DataFrame]:
    """Custom stateful transition: fold each micro-batch's rows (time-sorted)
    into (count, cents-sum, last-seen ts, max inter-event gap). All time math
    in integer microseconds — exact, so the DuckDB oracle matches bit-for-bit.
    Pure pandas/numpy inside an Arrow batch — no per-row Python."""
    if state.exists:
        n, sum_cents, last_ts_us, max_gap_us = state.get
    else:
        n, sum_cents, last_ts_us, max_gap_us = 0, 0, None, 0
    # Concat all Arrow chunks before sorting: max_gap is order-sensitive, so
    # a group spanning chunks must see ONE globally ts-sorted sequence.
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values("ts")
    ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs, exact ints
    if len(ts_us):
        gaps = ts_us.diff()
        if last_ts_us is not None:
            gaps.iloc[0] = ts_us.iloc[0] - last_ts_us
        g = gaps.max()
        if pd.notna(g):
            max_gap_us = max(max_gap_us, int(g))
        last_ts_us = int(ts_us.iloc[-1])
    n += len(pdf)
    sum_cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).sum())
    state.update((n, sum_cents, last_ts_us, max_gap_us))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [sum_cents],
         "max_gap_us": [max_gap_us]}
    )


def streaming_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user running profile (update mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=_PROFILE_OUT,
            stateStructType=_PROFILE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stream_user_profile"
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


STREAMING_USER_PROFILE_SQL = """
WITH gaps AS (
  SELECT user_id, value,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_cents,
       CAST(COALESCE(MAX(gap_us), 0) AS BIGINT) AS max_gap_us
FROM gaps
GROUP BY user_id
"""


def streaming_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: streaming events ⋈ broadcast customer dim, counts
    per market segment. The static side is re-read per micro-batch and
    broadcast — the fact stream never shuffles for the dim."""
    from ..catalog import table

    dim = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    joined = (
        _events_stream(spark, sf_dir)
        .join(dim, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )
    name = "stream_dim_join"
    _run_to_completion(joined, name)
    return spark.table(name)


STREAMING_DIM_JOIN_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


ATTRIBUTION_HOURS = 24


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join: every purchase joined to the same
    user's clicks in the preceding 24 h (last-touch attribution candidates).

    Both sides carry a watermark, and the join condition bounds click time to
    [purchase - 24 h, purchase], so the streaming engine can expire click
    state once the purchase-side watermark passes — state is bounded by
    (users × clicks-per-24 h), not by stream length. This is THE shape for
    joining two unbounded streams at scale; an unbounded condition would
    accumulate state forever.
    """
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "25 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_HOURS} HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_value",
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias(
            "gap_seconds"
        ),
    )
    name = "stream_click_attribution"
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


STREAMING_CLICK_ATTRIBUTION_SQL = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       c.event_id AS click_id,
       p.value AS purchase_value,
       CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT)
           AS gap_seconds
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL {ATTRIBUTION_HOURS} HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


_ANOMALY_OUT = (
    "event_id long, user_id long, value_c long, n_prior long, "
    "sum_prior_c long, is_anomaly boolean"
)
_ANOMALY_STATE = "n long, sum_c long"


def _update_anomaly(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: "GroupState") -> Iterator[pd.DataFrame]:
    """Per-event anomaly flags against the user's PRIOR history: an event is
    anomalous when value_c · n_prior > 3 · sum_prior_c (value exceeds 3× the
    running mean) — the reference's large-transaction rule
    (`transaction_transform.py:160-162`) restated in pure integers so the
    streaming path and the SQL-window oracle agree bit-for-bit. State is two
    longs per user; each batch is one numpy shifted-cumsum (no per-row
    Python). Rows are folded in (ts, event_id) order so state transitions
    are deterministic under any within-batch arrival order."""
    n0, s0 = state.get if state.exists else (0, 0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    vc = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64")
    sum_prior = np.cumsum(vc) - vc + s0
    n_prior = np.arange(len(vc), dtype="int64") + n0
    flag = (n_prior > 0) & (vc * n_prior > 3 * sum_prior)
    state.update((int(n0 + len(vc)), int(s0 + vc.sum())))
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": np.full(len(vc), key[0], dtype="int64"),
            "value_c": vc,
            "n_prior": n_prior,
            "sum_prior_c": sum_prior,
            "is_anomaly": flag,
        }
    )


def streaming_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly detection: the reference's batch 3σ/large-amount
    flags (`transaction_transform.py:150-177`) recast as an ONLINE detector
    — each event is judged against the user's running history at arrival
    time (no look-ahead), which is what a fraud pipeline actually needs.
    applyInPandasWithState carries (n, cents-sum) per user across
    micro-batches; the batch rule's groupBy-then-join-back disappears
    because the state IS the per-key aggregate. At 100 TB/day: state is 16
    bytes per user, partitioned by user_id across executors, and the
    detector emits per-event verdicts in append mode with no shuffle beyond
    the groupBy key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        _events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_anomaly,
            outputStructType=_ANOMALY_OUT,
            stateStructType=_ANOMALY_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stream_anomaly"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


STREAMING_ANOMALY_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS value_c
  FROM events
),
w AS (
  SELECT event_id, user_id, value_c,
         COALESCE(SUM(value_c) OVER prior, 0) AS sum_prior_c,
         COALESCE(COUNT(*) OVER prior, 0) AS n_prior
  FROM base
  WINDOW prior AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value_c,
       CAST(n_prior AS BIGINT) AS n_prior,
       CAST(sum_prior_c AS BIGINT) AS sum_prior_c,
       n_prior > 0 AND value_c * n_prior > 3 * sum_prior_c AS is_anomaly
FROM w
"""


_RATE_OUT = "event_id long, user_id long, day date, rn int"
_RATE_STATE = "last_day long, n_day long"
_RATE_CAP = 3  # must match operators/sampling.RATE_CAP_PER_DAY


def _update_rate_limit(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: "GroupState") -> Iterator[pd.DataFrame]:
    """Streaming first-N-per-day throttle: state is (last day seen, count
    that day) — two longs per user. Each batch sorts its rows, ranks
    within day via a vectorized cumcount, carries the state count into
    the first (possibly continued) day, and emits only rows under the
    cap. Day boundaries reset the counter implicitly (groupby day)."""
    last_day, n_day = state.get if state.exists else (-1, 0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    day = (pdf["ts"].astype("int64") // (86_400 * 10**9)).to_numpy()
    rank_in_batch = pd.Series(range(len(pdf))).groupby(day).cumcount().to_numpy()
    carry = np.where(day == last_day, n_day, 0)
    rn = rank_in_batch + 1 + carry
    if len(day):
        final_day = int(day[-1])
        final_count = int((day == final_day).sum()) + (
            n_day if final_day == last_day else 0
        )
        state.update((final_day, final_count))
    keep = rn <= _RATE_CAP
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy()[keep],
            "user_id": np.full(int(keep.sum()), key[0], dtype="int64"),
            "day": pd.to_datetime(day[keep] * 86_400, unit="s").date,
            "rn": rn[keep].astype("int32"),
        }
    )


def streaming_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch rate limiter (`sampling.py::rate_limit_sample`) as an
    ONLINE operator — throttling decisions at arrival time with 16 bytes
    of state per user, the shape an ingestion edge actually deploys
    (admit/drop now, not in tomorrow's batch). Emits exactly the batch
    operator's kept set: the DuckDB oracle is the SAME SQL as the batch
    query, making this a streaming/batch parity proof — the lambda-
    architecture equivalence people assert but rarely verify."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        _events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_rate_limit,
            outputStructType=_RATE_OUT,
            stateStructType=_RATE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stream_rate_limit"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


STREAMING_RATE_LIMIT_SQL = f"""
WITH ranked AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id, day, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= {_RATE_CAP}
"""


_EWMA_OUT = "user_id long, n_events int, ewma double"
_EWMA_STATE = "n long, s double"


def _update_ewma(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: "GroupState") -> Iterator[pd.DataFrame]:
    """Online EWMA: state is (count, smoothed value) — 16 bytes per user.
    The fold is a scalar Python loop ON PURPOSE: the closed-form
    vectorization (Σ α(1-α)^k x) reassociates the float ops and would
    break bit-parity with the batch fold; sequential s←0.75·s+0.25·x in
    CPython doubles is the IDENTICAL IEEE op sequence as Spark's
    F.aggregate fold and DuckDB's list_reduce."""
    import math

    from ..operators.windows import EWMA_ALPHA

    user_id = key[0]
    n, s = state.get if state.exists else (0, 0.0)
    # Concatenate ALL Arrow chunks before the single sort: a group spanning
    # multiple chunks (>10k rows/user/micro-batch, multi-file replay) would
    # otherwise fold values out of global (ts, event_id) order, and EWMA is
    # order-sensitive. Ordering ACROSS micro-batches is the source's
    # contract (the parquet replay is one batch; a real feed must deliver
    # per-user events in ts order for the parity claim to hold).
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf[pdf["value"].notna()].sort_values(["ts", "event_id"])
    for x in pdf["value"].to_numpy():
        x = float(x)
        s = x if n == 0 else s * (1.0 - EWMA_ALPHA) + x * EWMA_ALPHA
        n += 1
    state.update((n, s))
    if n > 0:
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "ewma": [math.floor(s * 1e6) / 1e6],
            }
        )


def streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch EWMA (`windows.py::ewma_smoothing`) as an ONLINE stateful
    operator — the second streaming/batch parity proof beside
    `streaming_rate_limit`, and the stronger one: the carried state is a
    FLOAT, so parity holds only because the per-event op sequence is
    bit-identical to the batch fold (and to the oracle's list_reduce).
    applyInPandasWithState carries (n, s) per user across micro-batches;
    each event updates in O(1) — the constant-memory form the batch
    docstring promises for series that outgrow arrays."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        _events_stream(spark, sf_dir)
        .select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stream_ewma"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _streaming_ewma_sql() -> str:
    from ..operators.windows import EWMA_SMOOTHING_SQL

    return EWMA_SMOOTHING_SQL


STREAMING_EWMA_SQL = _streaming_ewma_sql()


QUERIES: dict[str, QuerySpec] = {
    "streaming_ewma": QuerySpec(
        streaming_ewma, STREAMING_EWMA_SQL,
        "online float-state EWMA ≡ batch array fold (parity proof)",
    ),
    "streaming_rate_limit": QuerySpec(
        streaming_rate_limit, STREAMING_RATE_LIMIT_SQL,
        "online first-N-per-day throttle ≡ batch rate limiter (parity proof)",
    ),
    "streaming_anomaly": QuerySpec(
        streaming_anomaly, STREAMING_ANOMALY_SQL,
        "online per-event anomaly flags via integer running-mean state",
    ),
    "streaming_session_stats": QuerySpec(
        streaming_session_stats, STREAMING_SESSION_STATS_SQL,
        "gap-based session windows in the streaming engine",
    ),
    "streaming_user_profile": QuerySpec(
        streaming_user_profile, STREAMING_USER_PROFILE_SQL,
        "custom stateful operator via applyInPandasWithState",
    ),
    "streaming_dim_join": QuerySpec(
        streaming_dim_join, STREAMING_DIM_JOIN_SQL,
        "stream-static broadcast dim join",
    ),
    "streaming_click_attribution": QuerySpec(
        streaming_click_attribution, STREAMING_CLICK_ATTRIBUTION_SQL,
        "watermarked stream-stream interval self-join",
    ),
}
