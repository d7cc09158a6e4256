#!/usr/bin/env python
"""Micro-benchmark: three physical forms of the per-vector argmin
(kmeans_assign shape) at a given sf dir. Guide §1: measure before choosing.

  a) decorrelated: groupBy-min + equality join-back (pre-r9 form)
  b) struct-min:   ONE min(struct(dist, label)) aggregate
  c) rank window:  row_number over (vec_id) order (dist, label), rn = 1

All three produce identical rows. Prints median-of-3 noop-sink times and
the aggregate/window operator names from the executed plan.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.functions.numeric import ftrunc
from banking_etl_pipeline_spark.functions.vectors import as_double, dot
from banking_etl_pipeline_spark.operators.similarity import _centroid_frame
from banking_etl_pipeline_spark.session import get_spark


def scored_frame(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    cent = _centroid_frame(e).select(
        F.col("label").alias("cent_label"), "c",
        dot(F.col("c"), F.col("c")).alias("cdot"),
    )
    return (
        e.withColumn("vdot", dot(F.col("v"), F.col("v")))
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "label", "cent_label",
            (F.col("vdot") - 2.0 * dot(F.col("v"), F.col("c"))
             + F.col("cdot")).alias("dist"),
        )
    )


def form_a(spark, sf_dir):
    scored = scored_frame(spark, sf_dir)
    m = scored.groupBy(F.col("vec_id").alias("m_vec_id")).agg(
        F.min("dist").alias("min_dist"))
    best = (
        scored.join(m, (F.col("vec_id") == F.col("m_vec_id"))
                    & (F.col("dist") == F.col("min_dist")))
        .groupBy("vec_id", "label")
        .agg(F.min("cent_label").alias("assigned_label"),
             F.min("min_dist").alias("min_dist"))
    )
    return best.groupBy("label", "assigned_label").agg(
        F.count(F.lit(1)).alias("n"),
        ftrunc(F.avg("min_dist"), 6).alias("mean_sq_dist"))


def form_b(spark, sf_dir):
    scored = scored_frame(spark, sf_dir)
    best = (
        scored.groupBy("vec_id", "label")
        .agg(F.min(F.struct("dist", "cent_label")).alias("mn"))
        .select("label", F.col("mn.cent_label").alias("assigned_label"),
                F.col("mn.dist").alias("min_dist"))
    )
    return best.groupBy("label", "assigned_label").agg(
        F.count(F.lit(1)).alias("n"),
        ftrunc(F.avg("min_dist"), 6).alias("mean_sq_dist"))


def form_c(spark, sf_dir):
    scored = scored_frame(spark, sf_dir)
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cent_label"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("cent_label").alias("assigned_label"),
                F.col("dist").alias("min_dist"))
    )
    return best.groupBy("label", "assigned_label").agg(
        F.count(F.lit(1)).alias("n"),
        ftrunc(F.avg("min_dist"), 6).alias("mean_sq_dist"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="argmin_experiment")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    results = {}
    for name, fn in [("a_decorrelated", form_a), ("b_structmin", form_b),
                     ("c_window", form_c)]:
        df = fn(spark, sf_dir)
        df.count()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        agg_nodes = [ln.strip() for ln in
                     df._sc._jvm.PythonSQLUtils.explainString(
                         df._jdf.queryExecution(), "simple").splitlines()
                     if "Aggregate" in ln or "Window" in ln]
        results[name] = sorted(r for r in runs)
        print(f"{name}: median {statistics.median(runs):.3f}s runs={[round(r,3) for r in runs]}")
        for ln in agg_nodes[:6]:
            print(f"    {ln[:110]}")
    # sanity: identical outputs
    rows = [sorted(map(tuple, fn(spark, sf_dir).collect()))
            for fn in (form_a, form_b, form_c)]
    print("outputs identical:", rows[0] == rows[1] == rows[2])
    spark.stop()


if __name__ == "__main__":
    main()
