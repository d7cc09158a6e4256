#!/usr/bin/env python
"""Within-session A/B of cms_topk: hash-per-occurrence (pre-r9) vs
hash-per-distinct-token (r9). Interleaved, median-of-3, identity-checked."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.functions.hashing import md5_long
from banking_etl_pipeline_spark.operators.skew import (
    CMS_DEPTH, CMS_PROBE_K, CMS_WIDTH)
from banking_etl_pipeline_spark.session import get_spark, session_persist


def rc_explode(col):
    return F.explode(F.array(*[
        F.struct(
            F.lit(j).alias("row"),
            (md5_long(F.concat(F.lit(f"cms{j}:"), col)) % CMS_WIDTH)
            .alias("cell"))
        for j in range(CMS_DEPTH)]))


def old_form(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = session_persist(spark, f"x_cms_toks:{sf_dir}", lambda: d.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")))
    cells = toks.select("token", rc_explode(F.col("token")).alias("rc")).select(
        "token", F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    sketch = cells.groupBy("row", "cell").agg(F.count(F.lit(1)).alias("c"))
    exact = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
             .orderBy(F.desc("exact_n"), F.asc("token")).limit(CMS_PROBE_K))
    probe = exact.select("token", "exact_n",
                         rc_explode(F.col("token")).alias("rc")).select(
        "token", "exact_n", F.col("rc.row").alias("row"),
        F.col("rc.cell").alias("cell"))
    return (probe.join(F.broadcast(sketch), ["row", "cell"])
            .groupBy("token", "exact_n").agg(F.min("c").alias("cms_estimate")))


def new_form(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    tf = session_persist(spark, f"x_cms_tf:{sf_dir}", lambda: d.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("exact_n")))
    cells = tf.select("exact_n", rc_explode(F.col("token")).alias("rc")).select(
        F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"), "exact_n")
    sketch = cells.groupBy("row", "cell").agg(F.sum("exact_n").alias("c"))
    exact = tf.orderBy(F.desc("exact_n"), F.asc("token")).limit(CMS_PROBE_K)
    probe = exact.select("token", "exact_n",
                         rc_explode(F.col("token")).alias("rc")).select(
        "token", "exact_n", F.col("rc.row").alias("row"),
        F.col("rc.cell").alias("cell"))
    return (probe.join(F.broadcast(sketch), ["row", "cell"])
            .groupBy("token", "exact_n").agg(F.min("c").alias("cms_estimate")))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="cms_form_experiment")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    outs = {}
    for name, fn in [("old_occurrence", old_form), ("new_distinct", new_form)]:
        df = fn(spark, sf_dir)
        df.count()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"cms/{name}: median {statistics.median(runs):.3f}s "
              f"runs={[round(r, 3) for r in runs]}")
        outs[name] = sorted(map(tuple, df.collect()))
    print("outputs identical:",
          outs["old_occurrence"] == outs["new_distinct"])
    spark.stop()


if __name__ == "__main__":
    main()
