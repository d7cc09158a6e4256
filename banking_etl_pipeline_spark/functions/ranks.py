"""Distributed exact global ranking.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY plans a single-task
sort — the whole relation through one executor thread. The two-phase form
here is exact and fully parallel: range-partition on the sort order, rank
locally inside each partition, then add each partition's prefix row count
(a ≤P-row broadcast). A row's global rank does not depend on where the
range boundaries fall, so the sampling inside `repartitionByRange` needs no
determinism of its own.

`distributed_ntile` reproduces SQL NTILE(b) bit-for-bit from that rank:
the first (n mod b) buckets hold ceil(n/b) rows, the rest floor(n/b) —
property-tested against Spark's own ntile in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + an `out` column holding the exact 1-based global rank under
    `order_cols` (which must be a TOTAL order — include a unique
    tie-break). Every stage is parallel; the only single-task step is the
    ≤P-row prefix-offset cumsum."""
    from ..session import default_parallelism

    p = num_partitions or default_parallelism()
    parts = df.repartitionByRange(p, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_c").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_lrn") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + an `out` column holding the INCLUSIVE running sum of
    `value_col` under the total order `order_cols` — the two-phase twin of
    distributed_row_number: local running sums inside range partitions
    plus each partition's broadcast prefix TOTAL. Exact for integer
    values (the only kind this engine accumulates); a bare
    `SUM() OVER (ORDER BY …)` would single-task the relation."""
    from ..session import default_parallelism

    p = num_partitions or default_parallelism()
    parts = df.repartitionByRange(p, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "_lps",
        F.sum(value_col).over(
            Window.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_t").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_lps") + F.col("_off"))
        .drop("_pid", "_lps", "_off")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    buckets: int,
    out: str,
) -> DataFrame:
    """df + an `out` column equal to NTILE(buckets) OVER (ORDER BY
    order_cols) — computed from the distributed rank instead of a
    single-task global sort. Exact NTILE semantics: with n = |df|,
    q = n div b, rmd = n mod b, the first rmd buckets take q+1 rows."""
    b = int(buckets)
    ranked = distributed_row_number(df, order_cols, "_gr")
    n_df = df.agg(F.count(F.lit(1)).alias("_n"))
    j = ranked.crossJoin(F.broadcast(n_df))
    # integer-exact bucket of rank r: ranks ≤ rmd·(q+1) fall in the big
    # buckets (ceil division by q+1), the rest offset into the small ones
    big_cutoff = F.expr(f"(_n % {b}) * (_n div {b} + 1)")
    in_big = F.expr(
        f"(_gr + _n div {b}) div (_n div {b} + 1)"
    )
    in_small = F.expr(
        f"_n % {b} + (_gr - (_n % {b}) * (_n div {b} + 1)"
        f" + _n div {b} - 1) div (_n div {b})"
    )
    bucket = F.when(F.col("_gr") <= big_cutoff, in_big).otherwise(in_small)
    return j.withColumn(out, bucket.cast("int")).drop("_gr", "_n")
