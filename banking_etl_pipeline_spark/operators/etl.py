"""Driver-visible queries for the ETL surface: the staged-upsert merge
(K3, `readshift_loader.py:68-149`) expressed as a pure oracled query, and the
full banking transaction transform chain (clean→enrich→metrics→anomalies,
`transaction_transform.py:22-179`) over the deterministic distributed seed as
a rows-only check (its input is generated, not a driver table, so there is no
SQL oracle for it — correctness is covered by tests/test_banking_pipeline.py's
hand-computed expectations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..domain.seed import seed_all
from ..functions.numeric import cents
from ..domain.transactions import transform_transactions
from ..sinks.writers import merge_upsert as _merge
from ..spec import QuerySpec


def merge_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert an 'updates' slice of customer into a 'target' slice: matched
    keys take the update row, unmatched target rows survive."""
    c = table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") <= 1000).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = c.filter(F.col("c_custkey").between(500, 1500)).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
    )
    return _merge(target, updates, ["c_custkey"])


MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 1000
),
updates AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal
  FROM customer WHERE c_custkey BETWEEN 500 AND 1500
)
SELECT * FROM updates
UNION ALL
SELECT t.*
FROM target t LEFT JOIN updates u ON t.c_custkey = u.c_custkey
WHERE u.c_custkey IS NULL
"""


def pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII masking over the customer dimension — the
    compliance transform a banking pipeline (the reference's domain,
    `docs/customer_data.txt`) runs before data leaves the trusted zone:

    - pseudonymization: stable surrogate `substr(md5(name), 1, 12)` so joins
      still work across masked extracts without exposing the identifier;
    - suppression: digit runs in the name masked to '#' (regexp, global);
    - generalization: exact balance → 1000-wide band.

    All three are JVM-side built-ins (md5/regexp_replace/floor) — no UDF,
    fully codegen'd, and embarrassingly parallel: no shuffle at all, the
    plan is scan→project, so it scales linearly to any table size.
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring(F.md5(F.col("c_name")), 1, 12).alias("pseudonym"),
        F.regexp_replace(F.col("c_name"), "[0-9]", "#").alias("masked_name"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias(
            "acctbal_band"
        ),
        "c_mktsegment",
    )


PII_MASK_SQL = """
SELECT c_custkey,
       substr(md5(c_name), 1, 12) AS pseudonym,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
       CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer
"""


def latest_event_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot compaction: the latest event per user, plus how
    many changes it compacted away — the `row_number()=1` dedup every
    change-log consumer runs, done instead as ONE hash-aggregate pass with
    max_by on a zero-padded (epoch-µs, event_id) sortable key (deterministic
    under same-µs ties). No window, no per-key sort: at 100 TB the window
    formulation sorts every partition; this shape shuffles only the partial
    per-user maxima (map-side combine), the same plan that keeps a
    1000-executor MERGE snapshot build cheap.
    """
    e = table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d:%010d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return (
        e.select("user_id", "ts", "event_type", "value", key.alias("k"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.max("ts").alias("last_ts"),
            F.max_by("event_type", "k").alias("last_type"),
            F.max_by("value", "k").alias("last_value"),
        )
    )


LATEST_EVENT_SNAPSHOT_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_versions,
       MAX(ts) AS last_ts,
       arg_max(event_type, printf('%020d:%010d', epoch_us(ts), event_id))
           AS last_type,
       arg_max(value, printf('%020d:%010d', epoch_us(ts), event_id))
           AS last_value
FROM events
GROUP BY user_id
"""


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the audit the reference's staged upsert
    (`readshift_loader.py:68-149`) implies but never verifies: diff
    yesterday's vs today's customer snapshot into inserted / deleted /
    updated / unchanged, with the net balance movement per class.

    Snapshots are simulated deterministically from the one customer table
    (mod-key membership + a +50 balance bump on every 7th key). The diff is
    ONE full outer join on the PK with integer-cents value comparison —
    at 100 TB both snapshots live bucketed by PK (skew.write_bucketed), so
    the join is co-located and shuffle-free; the class counts are a 4-row
    aggregate. Exactly-once CDC without a change feed.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", cents(F.col("c_acctbal")).alias("bal_c")
    )
    old = c.filter(F.col("c_custkey") % 89 != 3)
    new = (
        c.filter(F.col("c_custkey") % 97 != 5)
        .withColumn(
            "bal_c",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("bal_c") + 5000
            ).otherwise(F.col("bal_c")),
        )
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.c_custkey") == F.col("n.c_custkey"), "full"
    )
    status = (
        F.when(F.col("o.c_custkey").isNull(), F.lit("inserted"))
        .when(F.col("n.c_custkey").isNull(), F.lit("deleted"))
        .when(F.col("o.bal_c") != F.col("n.bal_c"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    delta = F.coalesce(F.col("n.bal_c"), F.lit(0)) - F.coalesce(
        F.col("o.bal_c"), F.lit(0)
    )
    return (
        j.select(status.alias("status"), delta.alias("delta_c"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("delta_c").alias("net_delta_cents"),
        )
    )


SNAPSHOT_DIFF_SQL = """
WITH c AS (
  SELECT c_custkey, c_name,
         CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
  FROM customer
),
old AS (SELECT * FROM c WHERE c_custkey % 89 <> 3),
new AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 0 THEN bal_c + 5000 ELSE bal_c END AS bal_c
  FROM c WHERE c_custkey % 97 <> 5
)
SELECT CASE WHEN o.c_custkey IS NULL THEN 'inserted'
            WHEN n.c_custkey IS NULL THEN 'deleted'
            WHEN o.bal_c <> n.bal_c THEN 'updated'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(n.bal_c, 0) - COALESCE(o.bal_c, 0)) AS BIGINT)
           AS net_delta_cents
FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
GROUP BY 1
"""


def banking_txn_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed (deterministic, distributed) → full transaction transform chain."""
    data = seed_all(spark, num_customers=200, num_accounts=300,
                    num_transactions=3000)
    return transform_transactions(data["transactions"])


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply an insert/update/delete CHANGELOG to produce the live
    snapshot — the semantic layer `latest_event_snapshot` (keep-latest)
    lacks: a Debezium/Delta-CDF-style feed where the LAST operation per
    key decides existence. The changelog is derived deterministically
    from events (signup→I, view/click/purchase→U, error→D, applied in
    (ts, event_id) order per user); the apply is ONE hash aggregate —
    max_by over the zero-padded sortable key picks the final op and
    value, and tombstoned keys (last op = D) are filtered AFTER
    aggregation, so deletes cost nothing extra. Never a window sort, no
    join: the shuffle carries one partial candidate per (partition,
    user), which is the plan that applies a day's CDC feed to a
    billion-row dimension. Delete history stays visible as n_deletes.

    Reference tie-in: the staged upsert (`readshift_loader.py:68-149`)
    only knows matched/unmatched; CDC apply is its generalization to
    op-coded feeds (MERGE ... WHEN MATCHED AND op='D' THEN DELETE).
    """
    e = table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    key = F.format_string(
        "%020d:%010d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    applied = (
        e.select(
            "user_id",
            op.alias("op"),
            cents(F.col("value")).alias("value_c"),
            key.alias("k"),
        )
        .groupBy("user_id")
        .agg(
            F.max_by("op", "k").alias("last_op"),
            F.max_by("value_c", "k").alias("last_value_c"),
            F.count(F.lit(1)).alias("n_ops"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        )
    )
    return applied.filter(F.col("last_op") != "D").select(
        "user_id", "last_op", "last_value_c", "n_ops", "n_deletes"
    )


CDC_APPLY_SQL = """
WITH log AS (
  SELECT user_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS value_c,
         printf('%020d:%010d', epoch_us(ts), event_id) AS k
  FROM events
),
applied AS (
  SELECT user_id,
         arg_max(op, k) AS last_op,
         arg_max(value_c, k) AS last_value_c,
         CAST(COUNT(*) AS BIGINT) AS n_ops,
         CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
  FROM log GROUP BY user_id
)
SELECT user_id, last_op, last_value_c, n_ops, n_deletes
FROM applied WHERE last_op <> 'D'
"""


def late_dim_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension handling — the ETL decision the reference's
    orchestrator never makes (a fact row whose dimension hasn't landed
    yet either crashes the join or silently drops): facts LEFT-join the
    broadcast dim (here: every 17th customer 'hasn't arrived'), matched
    rows flow on, unmatched rows are QUARANTINED per month with counts
    and held revenue — the requeue manifest a scheduler retries after
    the next dim load. One broadcast left join + one aggregate; the
    quarantine branch costs nothing extra because the match flag is a
    column, not a second scan. At 100 TB the quarantine write is a
    by-month partitioned append, so the retry reads only pending
    partitions — same pruning story as `restatement_plan`."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    joined = o.select(
        month.alias("month"),
        "o_custkey",
        cents(F.col("o_totalprice")).alias("price_c"),
    ).join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"), "left")
    return joined.groupBy(
        "month", F.col("c_custkey").isNull().alias("quarantined")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_c").alias("revenue_c"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


LATE_DIM_QUARANTINE_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       d.c_custkey IS NULL AS quarantined,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_c,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders o
LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_custkey % 17 <> 0) d
  ON o.o_custkey = d.c_custkey
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "late_dim_quarantine": QuerySpec(
        late_dim_quarantine,
        LATE_DIM_QUARANTINE_SQL,
        "left-join quarantine manifest for late-arriving dimensions",
    ),
    "cdc_apply": QuerySpec(
        cdc_apply,
        CDC_APPLY_SQL,
        "I/U/D changelog apply with tombstone filtering, one aggregate",
    ),
    "merge_upsert": QuerySpec(
        merge_upsert_query, MERGE_UPSERT_SQL,
        "staged-upsert MERGE semantics as a pure anti-join + union",
    ),
    "pii_mask": QuerySpec(
        pii_mask, PII_MASK_SQL,
        "deterministic pseudonymize/suppress/generalize masking, shuffle-free",
    ),
    "latest_event_snapshot": QuerySpec(
        latest_event_snapshot, LATEST_EVENT_SNAPSHOT_SQL,
        "keep-latest-per-key CDC compaction as one max_by hash aggregate",
    ),
    "snapshot_diff": QuerySpec(
        snapshot_diff, SNAPSHOT_DIFF_SQL,
        "full-outer snapshot reconciliation: insert/delete/update classes",
    ),
    "banking_txn_pipeline": QuerySpec(
        banking_txn_pipeline, None,
        "full clean/enrich/metrics/anomaly chain on seeded banking data",
    ),
}
