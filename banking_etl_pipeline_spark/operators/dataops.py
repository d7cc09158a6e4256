"""Dataset-snapshot diff / drift audit tier over `orders` (REGISTRATION
DEFERRED — listed in registry._DEFERRED_MODULE_NAMES; enable by moving
this module's name into `registry._MODULES` once a driver-verification
slot opens).

The data-ops audit a daily-snapshot pipeline runs before promoting v2
over v1: which rows appeared, vanished, or changed (and in which
columns), how the column distributions drifted, and which changed keys
moved the most. The v2 snapshot is derived deterministically from v1 with
md5-gated mutations (the injected-known-signal discipline of dedup_exact
and the substrings tier): ~1/32 of keys dropped, a disjoint ~1/32
repriced (+1.00) and status-flipped, plus a shifted-key block of new
rows — so every detector has exact expected positives at any sf.

- dataset_diff: one full-outer join on the PK → per-class row counts
  (added / removed / changed / unchanged) and per-column change counts.
  `table_checksum` (quality.py) says "something differs"; this says what.
- column_drift_report: per-snapshot null rate and fixed-point mean of
  the money column plus the exact delta — the distribution-drift gate.
- changed_keys_sample: top-20 changed keys by absolute money delta
  (TakeOrdered) — the triage list a data-ops oncall opens first.

Scale: the diff is ONE co-partitioned full-outer equi-join on the PK
(both snapshots shuffle once on o_orderkey) feeding a single bounded
aggregate; drift is two scan-side aggregates; the sample is a bounded
heap. Column comparisons are null-safe (`eqNullSafe` ↔ DuckDB
`IS NOT DISTINCT FROM`); money compares in exact cents. No collect, no
cartesian, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import md5_long_seeded, sql_md5_long_seeded
from ..functions.numeric import cents, sql_cents
from ..spec import QuerySpec

DIFF_SEED = 131
DIFF_MOD = 32          # 1/32 of keys dropped; a disjoint 1/32 mutated
NEW_KEY_SHIFT = 1_000_000  # added rows live at o_orderkey + shift
NEW_MOD = 64           # 1/64 of keys also spawn a brand-new row
PRICE_BUMP = 1.0       # mutation: +1.00 on o_totalprice
TOP_CHANGED = 20

# columns compared cell-by-cell in the diff (money via exact cents)
_DIFF_COLS = ("o_custkey", "o_orderstatus", "price_c", "o_orderpriority")


def _v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        cents(F.col("o_totalprice")).alias("price_c"),
        "o_orderpriority",
    )


def _v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 with md5-gated deterministic mutations: bucket 0 of DIFF_MOD
    dropped, bucket 1 repriced (+PRICE_BUMP) and status-flipped, and
    NEW_MOD-bucket-0 keys cloned to o_orderkey + NEW_KEY_SHIFT."""
    v1 = _v1(spark, sf_dir)
    gate = md5_long_seeded(DIFF_SEED, F.col("o_orderkey").cast("string"))
    kept = v1.filter(gate % DIFF_MOD != 0)
    mutated = kept.select(
        "o_orderkey", "o_custkey",
        F.when(gate % DIFF_MOD == 1, F.lit("X"))
        .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(gate % DIFF_MOD == 1,
               F.col("price_c") + int(PRICE_BUMP * 100))
        .otherwise(F.col("price_c")).alias("price_c"),
        "o_orderpriority",
    )
    added = v1.filter(gate % NEW_MOD == 0).select(
        (F.col("o_orderkey") + NEW_KEY_SHIFT).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "price_c", "o_orderpriority",
    )
    return mutated.unionByName(added)


_SQL_V1 = f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       {sql_cents('o_totalprice')} AS price_c, o_orderpriority
FROM orders
"""

_SQL_GATE = sql_md5_long_seeded(DIFF_SEED, "CAST(o_orderkey AS VARCHAR)")

_SQL_SNAPSHOT_CTES = f"""
v1 AS ({_SQL_V1}),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN {_SQL_GATE} % {DIFF_MOD} = 1 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN {_SQL_GATE} % {DIFF_MOD} = 1
              THEN price_c + {int(PRICE_BUMP * 100)}
              ELSE price_c END AS price_c,
         o_orderpriority
  FROM v1 WHERE {_SQL_GATE} % {DIFF_MOD} != 0
  UNION ALL
  SELECT o_orderkey + {NEW_KEY_SHIFT}, o_custkey, o_orderstatus,
         price_c, o_orderpriority
  FROM v1 WHERE {_SQL_GATE} % {NEW_MOD} = 0
),
joined AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
         a.o_orderkey IS NOT NULL AS in_v1,
         b.o_orderkey IS NOT NULL AS in_v2,
         a.o_custkey IS NOT DISTINCT FROM b.o_custkey AS same_custkey,
         a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
             AS same_status,
         a.price_c IS NOT DISTINCT FROM b.price_c AS same_price,
         a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority
             AS same_priority,
         a.price_c AS p1, b.price_c AS p2
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
)"""


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _v1(spark, sf_dir).alias("a")
    b = _v2(spark, sf_dir).alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
    return j.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        F.col("a.o_orderkey").isNotNull().alias("in_v1"),
        F.col("b.o_orderkey").isNotNull().alias("in_v2"),
        F.col("a.o_custkey").eqNullSafe(F.col("b.o_custkey"))
        .alias("same_custkey"),
        F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
        .alias("same_status"),
        F.col("a.price_c").eqNullSafe(F.col("b.price_c"))
        .alias("same_price"),
        F.col("a.o_orderpriority").eqNullSafe(F.col("b.o_orderpriority"))
        .alias("same_priority"),
        F.col("a.price_c").alias("p1"),
        F.col("b.price_c").alias("p2"),
    )


def dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir)
    both = F.col("in_v1") & F.col("in_v2")
    changed = both & ~(
        F.col("same_custkey") & F.col("same_status")
        & F.col("same_price") & F.col("same_priority")
    )
    agg = [
        F.sum(F.when(F.col("in_v2") & ~F.col("in_v1"), 1).otherwise(0))
        .cast("long").alias("added"),
        F.sum(F.when(F.col("in_v1") & ~F.col("in_v2"), 1).otherwise(0))
        .cast("long").alias("removed"),
        F.sum(F.when(changed, 1).otherwise(0)).cast("long").alias("changed"),
        F.sum(F.when(both & ~changed, 1).otherwise(0)).cast("long")
        .alias("unchanged"),
    ]
    for name, col in (("custkey", "same_custkey"), ("status", "same_status"),
                      ("price", "same_price"),
                      ("priority", "same_priority")):
        agg.append(
            F.sum(F.when(both & ~F.col(col), 1).otherwise(0)).cast("long")
            .alias(f"chg_{name}")
        )
    return j.agg(*agg)


DATASET_DIFF_SQL = f"""
WITH {_SQL_SNAPSHOT_CTES}
SELECT
  CAST(SUM(CASE WHEN in_v2 AND NOT in_v1 THEN 1 ELSE 0 END) AS BIGINT)
      AS added,
  CAST(SUM(CASE WHEN in_v1 AND NOT in_v2 THEN 1 ELSE 0 END) AS BIGINT)
      AS removed,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND NOT (same_custkey AND same_status
           AND same_price AND same_priority) THEN 1 ELSE 0 END) AS BIGINT)
      AS changed,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND same_custkey AND same_status
           AND same_price AND same_priority THEN 1 ELSE 0 END) AS BIGINT)
      AS unchanged,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND NOT same_custkey
           THEN 1 ELSE 0 END) AS BIGINT) AS chg_custkey,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND NOT same_status
           THEN 1 ELSE 0 END) AS BIGINT) AS chg_status,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND NOT same_price
           THEN 1 ELSE 0 END) AS BIGINT) AS chg_price,
  CAST(SUM(CASE WHEN in_v1 AND in_v2 AND NOT same_priority
           THEN 1 ELSE 0 END) AS BIGINT) AS chg_priority
FROM joined
"""


def column_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0))
            .cast("long").alias("null_status"),
            F.sum("price_c").alias("sum_price_c"),
            F.expr("sum(price_c) div greatest(count(*), 1)")
            .alias("mean_price_c"),
        ).withColumn("snapshot", F.lit(tag))
    return stats(_v1(spark, sf_dir), "v1").unionByName(
        stats(_v2(spark, sf_dir), "v2")
    )


COLUMN_DRIFT_REPORT_SQL = f"""
WITH {_SQL_SNAPSHOT_CTES}
SELECT 'v1' AS snapshot, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS null_status,
       CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
       CAST(SUM(price_c) AS BIGINT) // GREATEST(COUNT(*), 1)
           AS mean_price_c
FROM v1
UNION ALL
SELECT 'v2', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(price_c) AS BIGINT),
       CAST(SUM(price_c) AS BIGINT) // GREATEST(COUNT(*), 1)
FROM v2
"""


def changed_keys_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir)
    ch = j.filter(
        F.col("in_v1") & F.col("in_v2") & ~(
            F.col("same_custkey") & F.col("same_status")
            & F.col("same_price") & F.col("same_priority")
        )
    )
    return (
        ch.select(
            F.col("k").alias("o_orderkey"),
            F.col("p1").alias("price_c_v1"),
            F.col("p2").alias("price_c_v2"),
            F.abs(F.col("p2") - F.col("p1")).alias("abs_delta_c"),
        )
        .orderBy(F.col("abs_delta_c").desc(), F.col("o_orderkey").asc())
        .limit(TOP_CHANGED)
    )


CHANGED_KEYS_SAMPLE_SQL = f"""
WITH {_SQL_SNAPSHOT_CTES}
SELECT k AS o_orderkey, p1 AS price_c_v1, p2 AS price_c_v2,
       ABS(p2 - p1) AS abs_delta_c
FROM joined
WHERE in_v1 AND in_v2 AND NOT (same_custkey AND same_status
      AND same_price AND same_priority)
ORDER BY abs_delta_c DESC, o_orderkey ASC
LIMIT {TOP_CHANGED}
"""


def queries() -> dict[str, QuerySpec]:
    return {
        "dataset_diff": QuerySpec(
            dataset_diff, DATASET_DIFF_SQL,
            "v1/v2 snapshot diff: class counts + per-column changes",
        ),
        "column_drift_report": QuerySpec(
            column_drift_report, COLUMN_DRIFT_REPORT_SQL,
            "per-snapshot null rate and exact mean-cents drift",
        ),
        "changed_keys_sample": QuerySpec(
            changed_keys_sample, CHANGED_KEYS_SAMPLE_SQL,
            "top-20 changed keys by absolute money delta",
        ),
    }
