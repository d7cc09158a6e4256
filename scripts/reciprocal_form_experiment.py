#!/usr/bin/env python
"""Within-session A/B for bitext_reciprocal_best: the committed
two-rank-window form vs an aggregate form (per-(src,lang) argmax ⋈
per-tgt argmax). Interleaved, median-of-3+, identity-checked."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from banking_etl_pipeline_spark.operators.bitext import _scored_cached
from banking_etl_pipeline_spark.session import get_spark


def window_form(spark, sf_dir):
    sc = _scored_cached(spark, sf_dir)
    w_src = Window.partitionBy("src_id", "tgt_lang").orderBy(
        F.desc("c6"), F.asc("tgt_id"))
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("c6"), F.asc("src_id"))
    return (
        sc.withColumn("rs", F.row_number().over(w_src))
        .withColumn("rt", F.row_number().over(w_tgt))
        .filter((F.col("rs") == 1) & (F.col("rt") == 1))
        .select("src_id", "tgt_id", "tgt_lang", F.col("c6").alias("cos6"))
        .orderBy("src_id", "tgt_id")
    )


def agg_form(spark, sf_dir):
    sc = _scored_cached(spark, sf_dir)
    # rank-1 rows of each window == per-group argmax with the same
    # (c6 DESC, id ASC) tie rule; reciprocal best = the intersection
    bs = (
        sc.groupBy("src_id", "tgt_lang")
        .agg(F.min(F.struct((-F.col("c6")).alias("nc"),
                            F.col("tgt_id"))).alias("mn"))
        .select("src_id", "tgt_lang", F.col("mn.tgt_id").alias("tgt_id"),
                (-F.col("mn.nc")).alias("cos6"))
    )
    bt = (
        sc.groupBy("tgt_id")
        .agg(F.min(F.struct((-F.col("c6")).alias("nc"),
                            F.col("src_id"))).alias("mn"))
        .select("tgt_id", F.col("mn.src_id").alias("src_id"))
    )
    return (
        bs.join(bt, ["src_id", "tgt_id"])
        .select("src_id", "tgt_id", "tgt_lang", "cos6")
        .orderBy("src_id", "tgt_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="reciprocal_experiment")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    outs = {}
    for name, fn in [("windows(current)", window_form), ("aggs", agg_form)]:
        df = fn(spark, sf_dir)
        df.count()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"reciprocal/{name}: median {statistics.median(runs):.3f}s "
              f"runs={[round(t, 3) for t in runs]}")
        outs[name] = sorted(map(tuple, df.collect()))
    print("outputs identical:", outs["windows(current)"] == outs["aggs"])
    spark.stop()


if __name__ == "__main__":
    main()
