#!/usr/bin/env python
"""Within-session A/Bs for r9 decisions that cross-process noise cannot
settle: basket_pairs cap form, dedup_embedding_cosine repartition, and the
semdedup two-level assignment form. Usage:

  python scripts/misc_form_experiments.py SF_DIR basket|dedup|twolevel
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.functions.vectors import as_double, dot
from banking_etl_pipeline_spark.session import get_spark

BASKET_MAX_LINES = 10
BASKET_TOP_K = 20


def timeit(name, df, runs=3):
    df.count()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: median {statistics.median(ts):.3f}s "
          f"runs={[round(t, 3) for t in ts]}")
    return df


def basket(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()

    def pairs_from(b):
        left = b.select(F.col("l_orderkey").alias("k"),
                        F.col("l_partkey").alias("p1"))
        right = b.select(F.col("l_orderkey").alias("k"),
                         F.col("l_partkey").alias("p2"))
        pairs = left.join(right, "k").filter(F.col("p1") < F.col("p2"))
        return (pairs.groupBy("p1", "p2")
                .agg(F.count(F.lit(1)).alias("support"))
                .orderBy(F.col("support").desc(), F.col("p1").asc(),
                         F.col("p2").asc())
                .limit(BASKET_TOP_K))

    small = (lines.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") <= BASKET_MAX_LINES).select("l_orderkey"))
    semi = lines.join(small, "l_orderkey", "semi")
    win = (lines.withColumn(
        "nb", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")))
        .filter(F.col("nb") <= BASKET_MAX_LINES)
        .select("l_orderkey", "l_partkey"))
    a = timeit("basket/semi_join_cap", pairs_from(semi))
    b = timeit("basket/window_cap", pairs_from(win))
    print("outputs identical:",
          sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())))


def dedup(spark, sf_dir):
    from banking_etl_pipeline_spark.operators.dedup import (
        COSINE_DUP_THRESHOLD, dedup_band_bits)
    from banking_etl_pipeline_spark.operators.lshscale import _bands_for
    from banking_etl_pipeline_spark.operators.similarity import (
        N_BANDS as EMB_BANDS)
    from banking_etl_pipeline_spark.session import session_scalar

    n = session_scalar(
        spark, f"embeddings_count:{sf_dir}",
        lambda: table(spark, sf_dir, "embeddings").count())
    bands = _bands_for(spark, sf_dir, EMB_BANDS, dedup_band_bits(n))
    a_, b_ = bands.alias("a"), bands.alias("b")
    cand = (a_.join(b_, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b")).distinct())

    def verify(e):
        ea = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                      F.col("nrm").alias("na"))
        eb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                      F.col("nrm").alias("nb"))
        sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (cand.join(ea, "vec_a").join(eb, "vec_b")
                .select("vec_a", "vec_b", sim.alias("cosine_sim"))
                .filter(F.col("cosine_sim") >= COSINE_DUP_THRESHOLD))

    base = table(spark, sf_dir, "embeddings")
    e_rep = (base.repartition(32)
             .select("vec_id", as_double(F.col("embedding")).alias("v"))
             .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v")))))
    e_plain = (base.select("vec_id", as_double(F.col("embedding")).alias("v"))
               .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v")))))
    a = timeit("dedup/with_repartition", verify(e_rep))
    b = timeit("dedup/no_repartition", verify(e_plain))
    print("outputs identical:",
          sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())))


def twolevel(spark, sf_dir):
    import banking_etl_pipeline_spark.operators.similarity as sim

    current = sim._two_level_cells

    def windows_form(e, centroids, n_coarse):
        from banking_etl_pipeline_spark.operators.similarity import N_QUERIES
        coarse = (centroids.filter(F.col("cell_id") < N_QUERIES + n_coarse)
                  .select(F.col("cell_id").alias("g_id"),
                          F.col("cv").alias("gv"), F.col("cn").alias("gn")))
        gsim = dot(F.col("cv"), F.col("gv")) / (F.col("cn") * F.col("gn"))
        wg = Window.partitionBy("cell_id").orderBy(F.desc("gs"), F.asc("g_id"))
        fine2coarse = coarse.select(
            F.col("g_id").alias("cell_id"), "g_id"
        ).unionByName(
            centroids.filter(F.col("cell_id") >= N_QUERIES + n_coarse)
            .crossJoin(F.broadcast(coarse))
            .select("cell_id", "g_id", gsim.alias("gs"))
            .withColumn("grn", F.row_number().over(wg))
            .filter(F.col("grn") <= 1).select("cell_id", "g_id"))
        vsim = dot(F.col("v"), F.col("gv")) / (F.col("nrm") * F.col("gn"))
        wv = Window.partitionBy("vec_id").orderBy(F.desc("vs"), F.asc("g_id"))
        vec2coarse = (e.crossJoin(F.broadcast(coarse))
                      .select("vec_id", "g_id", vsim.alias("vs"))
                      .withColumn("vrn", F.row_number().over(wv))
                      .filter(F.col("vrn") <= 1).select("vec_id", "g_id"))
        fsim = dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
        wf = Window.partitionBy("vec_id").orderBy(
            F.desc("fs"), F.asc("cell_id"))
        return (e.join(vec2coarse, "vec_id")
                .join(F.broadcast(fine2coarse), "g_id")
                .join(F.broadcast(centroids), "cell_id")
                .select("vec_id", "cell_id", fsim.alias("fs"))
                .withColumn("crn", F.row_number().over(wf))
                .filter(F.col("crn") <= 1).select("vec_id", "cell_id"))

    outs = {}
    for name, impl in [("structmin(current)", current),
                       ("windows(pre-r9)", windows_form)]:
        sim._two_level_cells = impl
        df = sim.semdedup_prune(spark, sf_dir)
        timeit(f"semdedup_twolevel/{name}", df)
        outs[name] = sorted(map(tuple, df.collect()))
    sim._two_level_cells = current
    print("outputs identical:",
          outs["structmin(current)"] == outs["windows(pre-r9)"])


def main() -> None:
    sf_dir, which = sys.argv[1], sys.argv[2]
    spark = get_spark(app_name=f"misc_experiment_{which}")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    {"basket": basket, "dedup": dedup, "twolevel": twolevel}[which](
        spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
