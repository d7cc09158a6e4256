#!/usr/bin/env python
"""Within-session A/B of the _ivf_assignments(n_best=1) physical form as
consumed by semdedup_prune and ann_ivf: window rank-1 (WindowGroupLimit)
vs min(struct) aggregate. Same session, interleaved, median-of-3 each,
identity-checked. Guide §1: decide on measurements, not theory."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

import banking_etl_pipeline_spark.operators.similarity as sim
from banking_etl_pipeline_spark.functions.vectors import dot
from banking_etl_pipeline_spark.session import get_spark


def ivf_window(e, centroids, n_best, id_col):
    s = dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    return (
        e.crossJoin(F.broadcast(centroids))
        .select(id_col, "cell_id", s.alias("cell_sim"))
        .withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n_best)
        .select(id_col, "cell_id")
    )


def ivf_structmin(e, centroids, n_best, id_col):
    s = dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    scored = (
        e.crossJoin(F.broadcast(centroids))
        .select(id_col, "cell_id", s.alias("cell_sim"))
    )
    if n_best == 1:
        return (
            scored.groupBy(id_col)
            .agg(F.min(F.struct((-F.col("cell_sim")).alias("ns"),
                                F.col("cell_id"))).alias("mn"))
            .select(id_col, F.col("mn.cell_id").alias("cell_id"))
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n_best)
        .select(id_col, "cell_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    key = sys.argv[2] if len(sys.argv) > 2 else "semdedup_prune"
    build = {"semdedup_prune": sim.semdedup_prune, "ann_ivf": sim.ann_ivf}[key]
    spark = get_spark(app_name="ivf_form_experiment")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    outs = {}
    for name, impl in [("window", ivf_window), ("structmin", ivf_structmin)]:
        sim._ivf_assignments = impl
        df = build(spark, sf_dir)
        df.count()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"{key}/{name}: median {statistics.median(runs):.3f}s "
              f"runs={[round(r, 3) for r in runs]}")
        outs[name] = sorted(map(tuple, df.collect()))
    print("outputs identical:", outs["window"] == outs["structmin"])
    spark.stop()


if __name__ == "__main__":
    main()
