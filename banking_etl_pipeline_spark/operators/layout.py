"""Physical-layout and maintenance operators.

The reference's only layout decision is partitioning the processed zone by
`transaction_year, transaction_month` (`config/config.json:70`,
`main.py:201-206`) — one-dimensional pruning. At 100 TB a fact table is
queried along MORE than one key (here: order AND part), and the standard
warehouse answer is a space-filling-curve sort (Z-order / Hilbert) so file
min/max statistics prune on BOTH dimensions. `zorder_layout` computes the
interleaved-bit Z-value and reports the per-bucket bounding box — the
data-skipping index a writer would persist next to each file.

`incremental_agg` is the other maintenance primitive the reference implies
but never builds: its "incremental" load is Delta `append` with date
partitions (`config/config.json:69-70`), which makes downstream aggregates
recompute from scratch. Sum/count partial aggregates are MERGEABLE, so the
rollup can be maintained as (yesterday's partials) ⊎ (today's delta
partials) re-aggregated — never a full-table rescan. The query proves the
algebra: split-partials re-aggregated hash-match the one-pass oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import cents
from ..spec import QuerySpec

_ZBITS = 16  # bits kept per dimension; 2·16 = 32-bit Z-value


def _zvalue(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of x (even positions) and y (odd).

    Pure integer bit arithmetic — whole-stage-codegen'd JVM expressions, no
    UDF. The same formula is emitted as SQL text for the oracle by
    `_zvalue_sql`, so both engines compute bit-identical Z-values.
    """
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _zvalue_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality report over lineitem (l_orderkey × l_partkey).

    Keys are first NORMALIZED into the 16-bit curve domain by each
    dimension's max (integer scale: x·65535 div max — exact in both
    engines; a Z-order writer always normalizes, otherwise small-domain
    keys collapse onto one curve cell). The two maxes are a 1-row
    aggregate broadcast back — the only non-scan input. Bucket = top 6
    Z-value bits (64 buckets ≅ 64 files); each bucket's bounding box
    [min,max]×[min,max] is what a file-skipping reader consults, and
    Z-ordering keeps the boxes narrow in BOTH keys so a predicate on
    either dimension prunes most buckets
    (tests/test_properties.py::test_zorder_buckets_localize pins the mean
    box area ≪ domain). At 100 TB: compute z once at write time,
    `repartitionByRange(z)` + sortWithinPartitions → the parquet footer
    min/max stats ARE this report. One scan, one broadcast, one bounded
    hash aggregate.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_orderkey").cast("long")
    y = F.col("l_partkey").cast("long")
    maxes = li.agg(
        F.max(x).alias("mx"), F.max(y).alias("my")
    )
    keyed = li.select(x.alias("xr"), y.alias("yr")).crossJoin(
        F.broadcast(maxes)
    )
    mask = F.lit((1 << _ZBITS) - 1)
    xs = F.expr(f"(xr * {(1 << _ZBITS) - 1}) div mx")
    ys = F.expr(f"(yr * {(1 << _ZBITS) - 1}) div my")
    z = _zvalue(xs.bitwiseAND(mask), ys.bitwiseAND(mask))
    return (
        keyed.select(
            F.shiftright(z, 2 * _ZBITS - 6).alias("z_bucket"),
            F.col("xr").alias("xk"),
            F.col("yr").alias("yk"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xk").alias("min_order"),
            F.max("xk").alias("max_order"),
            F.min("yk").alias("min_part"),
            F.max("yk").alias("max_part"),
        )
    )


_MASK = (1 << _ZBITS) - 1
ZORDER_LAYOUT_SQL = f"""
WITH maxes AS (
  SELECT MAX(CAST(l_orderkey AS BIGINT)) AS mx,
         MAX(CAST(l_partkey AS BIGINT)) AS my
  FROM lineitem
),
keyed AS (
  SELECT CAST(l_orderkey AS BIGINT) AS xr,
         CAST(l_partkey AS BIGINT) AS yr,
         ((CAST(l_orderkey AS BIGINT) * {_MASK}) // mx) & {_MASK} AS xk,
         ((CAST(l_partkey AS BIGINT) * {_MASK}) // my) & {_MASK} AS yk
  FROM lineitem CROSS JOIN maxes
),
zed AS (
  SELECT xr, yr, ({_zvalue_sql("xk", "yk")}) AS z FROM keyed
)
SELECT (z >> {2 * _ZBITS - 6}) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(xr) AS min_order, MAX(xr) AS max_order,
       MIN(yr) AS min_part,  MAX(yr) AS max_part
FROM zed
GROUP BY z_bucket
"""


def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-partial-aggregate maintenance of a monthly revenue rollup.

    The materialized view is `month → (sum_cents, n)`. Yesterday's state is
    the partial aggregate over l_shipdate < 1997-01-01; today's delta batch
    is the rest. Maintenance = unionByName + re-aggregate — the merge step
    of any distributive aggregate, identical to what Spark's own partial/
    final hash aggregation does across partitions. The DuckDB oracle
    computes the rollup in one pass; hash-equality proves the incremental
    path is exact (integer cents, so no float merge-order noise). At 100 TB
    the delta side is one day's partition — the rescan the reference's
    append-only design forces simply disappears.
    """
    li = table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
        F.col("l_shipdate"),
    )
    cut = F.lit("1997-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.sum("cents").alias("sum_cents"),
            F.count(F.lit(1)).alias("n"),
        )

    base = partial(li.filter(F.col("l_shipdate") < cut))
    delta = partial(li.filter(F.col("l_shipdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(F.sum("sum_cents").alias("sum_cents"), F.sum("n").alias("n"))
    )
    return merged.select(
        F.col("month").cast("date").alias("month"),
        (F.col("sum_cents").cast("double") / 100.0).alias("revenue"),
        "n",
    )


INCREMENTAL_AGG_SQL = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                 AS DOUBLE) / 100.0 AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY date_trunc('month', l_shipdate)
"""


COMPACT_TARGET_BYTES = 65_536  # simulated target output-file size
_ROW_BYTES = 120  # synthetic average row width for the simulated manifest


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the OPTIMIZE/bin-packing step every
    long-lived partitioned table needs (the reference's append-mode Delta
    loads, `config/config.json:69-70`, are exactly how small files
    accumulate). The manifest is simulated from lineitem: one "file" per
    (ship-month, orderkey-bucket) with size = rows × 120 bytes. Planning
    is linear bin packing per partition: order files by (bytes desc,
    bucket), running-sum their sizes, and bin = floor((cumsum − bytes) /
    target) — each output bin concatenates adjacent files to ≈ the target
    size. All integer arithmetic; one window sort per PARTITION (month),
    never global — and the input is table METADATA (one row per file), so
    at 100 TB the plan runs on a manifest of ~10⁵ rows no matter how big
    the data is. Output: per (month, bin) the file count, total bytes,
    and whether the bin actually merges anything (n_files > 1)."""
    li = table(spark, sf_dir, "lineitem")
    manifest = (
        li.groupBy(
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
            (F.col("l_orderkey") % 50).alias("file_id"),
        )
        .agg((F.count(F.lit(1)) * _ROW_BYTES).alias("bytes"))
    )
    w = (
        Window.partitionBy("month")
        .orderBy(F.col("bytes").desc(), F.col("file_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = manifest.withColumn(
        "bin",
        F.floor(
            (F.sum("bytes").over(w) - F.col("bytes")) / COMPACT_TARGET_BYTES
        ),
    )
    return binned.groupBy("month", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        (F.count(F.lit(1)) > 1).alias("merges"),
    )


COMPACTION_PLAN_SQL = f"""
WITH manifest AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         l_orderkey % 50 AS file_id,
         CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS bytes
  FROM lineitem GROUP BY 1, 2
),
binned AS (
  SELECT month, bytes,
         CAST(FLOOR((SUM(bytes) OVER (PARTITION BY month
                                      ORDER BY bytes DESC, file_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)
                     - bytes) / {COMPACT_TARGET_BYTES}) AS BIGINT) AS bin
  FROM manifest
)
SELECT month, bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       COUNT(*) > 1 AS merges
FROM binned GROUP BY month, bin
"""


def restatement_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-targeted BACKFILL, proven as an algebraic law: when a
    dimension is corrected (here: every 13th customer moves market
    segment), a naive pipeline recomputes the whole rollup; the scalable
    restatement recomputes ONLY the months containing facts of affected
    keys and unions them with the untouched months' existing partials.
    Spark runs the partial path — affected-month set (distinct months of
    affected customers' orders, broadcast), anti-join to keep untouched
    rollup rows, recompute just the affected slice with the corrected
    dim — and the DuckDB oracle runs the full recompute; hash equality
    is the proof the two pipelines agree. At 100 TB with month-partitioned
    facts, the affected-month filter is PARTITION PRUNING on the fact
    scan: the restatement reads only corrected partitions, O(delta
    months), never O(history) — the same merge-of-partials algebra as
    `incremental_agg`, applied to corrections instead of appends."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg_new = F.when(
        F.col("c_custkey") % 13 == 0, F.lit("RESTATED")
    ).otherwise(F.col("c_mktsegment"))
    dim_old = c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    dim_new = c.select("c_custkey", seg_new.alias("segment"))
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    fact = o.select(
        month.alias("month"),
        "o_custkey",
        cents(F.col("o_totalprice")).alias("price_c"),
    )

    def rollup(dim: DataFrame, f: DataFrame) -> DataFrame:
        return (
            f.join(F.broadcast(dim), f["o_custkey"] == dim["c_custkey"])
            .groupBy("month", "segment")
            .agg(
                F.sum("price_c").alias("revenue_c"),
                F.count(F.lit(1)).alias("n_orders"),
            )
        )

    affected_months = (
        fact.filter(F.col("o_custkey") % 13 == 0).select("month").distinct()
    )
    untouched = rollup(dim_old, fact).join(
        F.broadcast(affected_months), "month", "anti"
    )
    restated = rollup(
        dim_new, fact.join(F.broadcast(affected_months), "month", "semi")
    )
    return untouched.unionByName(restated)


RESTATEMENT_PLAN_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CASE WHEN c_custkey % 13 = 0 THEN 'RESTATED' ELSE c_mktsegment END
           AS segment,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


RANGE_SPLITS = 32


def range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-partition boundaries — the split points a sorted
    or range-partitioned write needs (`repartitionByRange` computes these
    by sampling; a layout job computes them exactly from yesterday's
    data): the k/32 quantiles of the sort key via `percentile_disc`-style
    DISCRETE selection (an actual data value, integer-exact — no
    interpolation floats), plus the rows-per-bucket each boundary implies.
    Equi-depth is what keeps range-partitioned files the SAME SIZE under
    skew, where equi-width (`zorder_layout`'s uniform buckets) would put
    90% of rows in one file. The global rank is computed DISTRIBUTED —
    two-phase: range-partition on the sort key, rank locally inside each
    partition, then add each partition's prefix offset (a ≤P-row cumsum
    broadcast back). A bare `row_number() OVER (ORDER BY …)` would drag
    the whole table through ONE task — serial at sf0.1 already, dead at
    100 TB; the two-phase form is exact and every stage is parallel (the
    rank of a row does not depend on how the ranges were cut, so the
    sampled range boundaries don't need to be deterministic). At 100 TB
    you'd additionally rank a deterministic hash SAMPLE (`sample_hash`)
    of ~10⁶ rows, which is how `repartitionByRange` itself derives
    boundaries. Output is 32 rows of metadata the writer broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    n = li.count()
    from ..functions.ranks import distributed_row_number

    ranked = distributed_row_number(
        li.select("l_orderkey", "l_linenumber"),
        [F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        out="rn",
    )
    import math

    # ceil on double division: n·i < 2^53 and the divisor is a power of
    # two, so the division is exact in IEEE double on every engine
    targets = spark.createDataFrame(
        [
            (i, int(math.ceil(n * i / RANGE_SPLITS)))
            for i in range(1, RANGE_SPLITS + 1)
        ],
        "bucket int, target long",
    )
    return (
        ranked.join(
            F.broadcast(targets), F.col("rn") == F.col("target")
        )
        .select(
            "bucket",
            F.col("l_orderkey").alias("split_key"),
            "target",
        )
    )


RANGE_SPLIT_POINTS_SQL = f"""
WITH ranked AS (
  SELECT l_orderkey,
         ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
targets AS (
  SELECT b AS bucket,
         CAST(CEIL(n * b / {RANGE_SPLITS}.0) AS BIGINT) AS target
  FROM n, LATERAL (SELECT unnest(range(1, {RANGE_SPLITS + 1})) AS b)
)
SELECT t.bucket, r.l_orderkey AS split_key, t.target
FROM ranked r JOIN targets t ON r.rn = t.target
"""


ZM_FILE_KEYS = 256  # synthetic file = 256 consecutive order keys
ZM_SHIP_CUTOFF = "2000-01-01 00:00:00"
ZM_OKEY_CUTOFF = 1_000


def zonemap_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max statistics) pruning effectiveness audit —
    the report a table-maintenance job runs to decide whether a layout
    rewrite (sort / Z-order) is worth it. Files are simulated as
    ZM_FILE_KEYS consecutive order keys (the natural ingest order). Two
    predicate classes are audited off ONE per-file stats aggregate:
    `l_orderkey <= c` prunes almost everything (the key is the write
    order, so file ranges are disjoint) while `l_shipdate >= c` prunes
    almost nothing (ship dates are uncorrelated with write order) — the
    gap IS the case for re-sorting. One shuffle on the derived file id,
    then two bounded aggregate rows; scales as a single pass."""
    li = table(spark, sf_dir, "lineitem")
    stats = (
        li.groupBy(F.expr(f"l_orderkey div {ZM_FILE_KEYS}").alias("file_id"))
        .agg(
            F.max("l_shipdate").alias("mx_ship"),
            F.min("l_orderkey").alias("mn_okey"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    ship_skip = F.col("mx_ship") < F.lit(ZM_SHIP_CUTOFF).cast("timestamp")
    okey_skip = F.col("mn_okey") > ZM_OKEY_CUTOFF
    ship = stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(ship_skip.cast("long")).alias("n_skippable"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(ship_skip, F.col("n_rows")).otherwise(0))
        .alias("rows_skipped"),
    ).withColumn("predicate", F.lit("ship_ge_cutoff"))
    okey = stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(okey_skip.cast("long")).alias("n_skippable"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(okey_skip, F.col("n_rows")).otherwise(0))
        .alias("rows_skipped"),
    ).withColumn("predicate", F.lit("okey_le_cutoff"))
    cols = ["predicate", "n_files", "n_skippable", "rows_total",
            "rows_skipped"]
    return ship.select(cols).unionByName(okey.select(cols))


ZONEMAP_PRUNE_REPORT_SQL = f"""
WITH stats AS (
  SELECT l_orderkey // {ZM_FILE_KEYS} AS file_id,
         MAX(l_shipdate) AS mx_ship,
         MIN(l_orderkey) AS mn_okey,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
)
SELECT 'ship_ge_cutoff' AS predicate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN mx_ship < TIMESTAMP '{ZM_SHIP_CUTOFF}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN mx_ship < TIMESTAMP '{ZM_SHIP_CUTOFF}'
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped
FROM stats
UNION ALL
SELECT 'okey_le_cutoff' AS predicate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN mn_okey > {ZM_OKEY_CUTOFF}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN mn_okey > {ZM_OKEY_CUTOFF}
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped
FROM stats
"""


QUERIES: dict[str, QuerySpec] = {
    "zonemap_prune_report": QuerySpec(
        zonemap_prune_report,
        ZONEMAP_PRUNE_REPORT_SQL,
        "file min/max zone-map pruning audit across two predicate classes",
    ),
    "range_split_points": QuerySpec(
        range_split_points,
        RANGE_SPLIT_POINTS_SQL,
        "exact equi-depth range-partition boundaries for sorted writes",
    ),
    "restatement_plan": QuerySpec(
        restatement_plan,
        RESTATEMENT_PLAN_SQL,
        "partition-targeted backfill ≡ full recompute (algebraic proof)",
    ),
    "compaction_plan": QuerySpec(
        compaction_plan,
        COMPACTION_PLAN_SQL,
        "per-partition small-file bin packing over a simulated manifest",
    ),
    "zorder_layout": QuerySpec(
        zorder_layout,
        ZORDER_LAYOUT_SQL,
        "Z-order curve bucketing with per-bucket min/max skipping stats",
    ),
    "incremental_agg": QuerySpec(
        incremental_agg,
        INCREMENTAL_AGG_SQL,
        "rollup maintained by merging partial aggregates vs one-pass oracle",
    ),
}
