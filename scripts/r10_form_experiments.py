#!/usr/bin/env python
"""r10 within-session interleaved form A/Bs (the only timing methodology
that is trustworthy on this box — cross-session drift is 15-35%, see
OPTIMIZATION_r09.md "Measurement method note").

Compares the r10 single-pass rewrites against their r9 forms, BOTH built in
ONE SparkSession, outputs identity-checked, then timed noop runs strictly
interleaved (new, old, new, old, ...) with the median reported:

  recall     lsh_recall_tradeoff_report: 4x (probe-join + distinct + truth
             join + agg) pipelines -> ONE pass over the tagged union
  paramscan  lsh_paramscan_report: 4x (groupBy + agg) -> ONE tagged pass
  sweep      minhash_param_sweep: 3x (explode + self-join + dedup + full
             join + agg) -> ONE tagged pass

Usage: python scripts/r10_form_experiments.py [sf_dir] [which ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from banking_etl_pipeline_spark.operators import lshscale as L  # noqa: E402
from banking_etl_pipeline_spark.operators import reports as R  # noqa: E402
from banking_etl_pipeline_spark.session import get_spark  # noqa: E402

N_TIMED = 5


# --------------------------------------------------------------------------
# r9 forms, verbatim from git (commit 43c4ccf), minus comments
# --------------------------------------------------------------------------

def old_paramscan(spark, sf_dir):
    parts = []
    for n_bands, band_bits in L.CONFIGS:
        buckets = (
            L._bands_for(spark, sf_dir, n_bands, band_bits)
            .groupBy("band", "sig")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        parts.append(
            buckets.agg(
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
                F.max("n").alias("max_bucket_n"),
                F.sum(F.expr("n * (n - 1) div 2")).cast("long")
                .alias("candidate_pairs"),
            ).select(
                F.lit(n_bands).alias("n_bands"),
                F.lit(band_bits).alias("band_bits"),
                "n_buckets", "max_bucket_n", "candidate_pairs",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("band_bits", "n_bands")


def old_recall(spark, sf_dir):
    truth = L._true_probe_pairs(spark, sf_dir).select("vec_a", "vec_b")
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    parts = []
    for n_bands, band_bits in L.CONFIGS:
        bands = L._bands_for(spark, sf_dir, n_bands, band_bits)
        pb = bands.filter(F.col("vec_id") < L.PROBE_IDS).select(
            F.col("vec_id").alias("vec_a"),
            F.col("band").alias("aband"),
            F.col("sig").alias("asig"),
        )
        cand = (
            F.broadcast(pb)
            .join(
                bands,
                (F.col("aband") == F.col("band"))
                & (F.col("asig") == F.col("sig"))
                & (F.col("vec_a") < F.col("vec_id")),
            )
            .select("vec_a", F.col("vec_id").alias("vec_b"))
            .distinct()
        )
        stats = (
            cand.join(
                F.broadcast(truth.withColumn("is_true", F.lit(1))),
                ["vec_a", "vec_b"], "left",
            ).agg(
                F.count(F.lit(1)).cast("long").alias("probe_candidates"),
                F.coalesce(F.sum("is_true"), F.lit(0)).cast("long")
                .alias("n_caught"),
            )
        )
        parts.append(
            stats.crossJoin(F.broadcast(n_true))
            .selectExpr(
                f"{n_bands} AS n_bands",
                f"{band_bits} AS band_bits",
                "probe_candidates",
                "n_true_pairs",
                "n_caught",
                "n_caught * 1000 div greatest(n_true_pairs, 1L)"
                " AS recall_permille",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("band_bits", "n_bands")


def old_sweep(spark, sf_dir):
    from banking_etl_pipeline_spark.operators.dedup import (
        shingle_pair_commons_cached,
    )
    from banking_etl_pipeline_spark.operators.reports import (
        MINHASH_EST_THRESHOLD,
        N_HASHES,
        SWEEP_CONFIGS,
        SWEEP_PROBE_DOCS,
        _sigs_cached,
    )
    from banking_etl_pipeline_spark.functions.numeric import ftrunc

    sigs = _sigs_cached(spark, sf_dir)
    truth = (
        shingle_pair_commons_cached(spark, sf_dir)
        .filter(F.col("doc_a") < SWEEP_PROBE_DOCS)
        .select(
            "doc_a", "doc_b",
            (F.col("common").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("common"))).alias("j"),
        )
        .filter(F.col("j") >= MINHASH_EST_THRESHOLD)
        .select("doc_a", "doc_b", F.lit(1).alias("t"))
    )
    est = (
        F.aggregate(
            F.zip_with(F.col("sig_a"), F.col("sig_b"),
                       lambda x, y: (x == y).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        ).cast("double") / float(N_HASHES)
    )
    per_config = []
    for bands, rows in SWEEP_CONFIGS:
        bands_df = sigs.select(
            "doc_id", "sig",
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.element_at(F.col("sig"), b * rows + r + 1)
                        .cast("string")
                        for r in range(rows)
                    ])).alias("bh"),
                )
                for b in range(bands)
            ])).alias("bk"),
        ).select("doc_id", "sig", F.col("bk.band").alias("band"),
                 F.col("bk.bh").alias("bh"))
        a = bands_df.filter(F.col("doc_id") < SWEEP_PROBE_DOCS).alias("a")
        b_ = bands_df.alias("b")
        cand = (
            a.join(b_, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.sig").alias("sig_a"),
                    F.col("b.sig").alias("sig_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        pred = cand.select(
            "doc_a", "doc_b", est.alias("e")
        ).filter(F.col("e") >= MINHASH_EST_THRESHOLD).select(
            "doc_a", "doc_b", F.lit(1).alias("p")
        )
        j = truth.join(pred, ["doc_a", "doc_b"], "full")
        agg = j.agg(
            F.lit(bands).alias("bands"),
            F.lit(rows).alias("rows_per_band"),
            F.sum(F.coalesce("t", F.lit(0))).alias("n_truth"),
            F.sum(F.coalesce("p", F.lit(0))).alias("n_pred"),
            F.sum((F.col("t").isNotNull() & F.col("p").isNotNull())
                  .cast("long")).alias("n_hit"),
        )
        per_config.append(agg)
    out = per_config[0]
    for c in per_config[1:]:
        out = out.unionByName(c)
    prec = F.when(F.col("n_pred") > 0,
                  F.col("n_hit").cast("double") / F.col("n_pred")) \
        .otherwise(F.lit(0.0))
    rec = F.when(F.col("n_truth") > 0,
                 F.col("n_hit").cast("double") / F.col("n_truth")) \
        .otherwise(F.lit(0.0))
    return out.select(
        "bands", "rows_per_band", "n_truth", "n_pred", "n_hit",
        ftrunc(prec, 6).alias("precision"),
        ftrunc(rec, 6).alias("recall"),
    )


def old_dedup_incremental(spark, sf_dir):
    """r9-pre form: max_by key as the zero-padded printf STRING (one string
    alloc per candidate) instead of the struct key — the r10 re-settle of
    the r9 paired regression (0.24 -> 0.32 s, inside noise; VERDICT item
    4)."""
    from banking_etl_pipeline_spark.operators.curation import (
        INC_MOD,
        N_HASHES,
        md5_long,
        minhash_bands_cached,
    )

    bands = minhash_bands_cached(spark, sf_dir)
    incoming_flag = md5_long(
        F.concat(F.lit("inc:"), F.col("doc_id").cast("string"))
    ) % INC_MOD == 0
    bands = bands.withColumn("inc", incoming_flag)
    probe = bands.filter("inc").select(
        F.col("doc_id").alias("in_doc"), F.col("sig").alias("in_sig"),
        "band", "bh",
    )
    index = bands.filter(~F.col("inc")).select(
        F.col("doc_id").alias("corpus_doc"), F.col("sig").alias("corpus_sig"),
        "band", "bh",
    )
    n_match = F.aggregate(
        F.zip_with(F.col("in_sig"), F.col("corpus_sig"),
                   lambda x, y: (x == y).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    cand = (
        probe.join(index, ["band", "bh"])
        .select("in_doc", "corpus_doc", "in_sig", "corpus_sig")
        .dropDuplicates(["in_doc", "corpus_doc"])
        .select("in_doc", "corpus_doc", n_match.alias("n_match"))
    )
    best_key = F.format_string(
        "%02d:%010d", F.col("n_match"),
        F.lit(9_999_999_999) - F.col("corpus_doc"))
    per_doc = cand.groupBy("in_doc").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum((F.col("n_match") >= int(0.2 * N_HASHES) + 1).cast("long"))
        .alias("n_dups"),
        F.max_by("corpus_doc", best_key).alias("best_match"),
        F.max("n_match").alias("best_n_match"),
    )
    incoming_docs = bands.filter("inc").select(
        F.col("doc_id").alias("in_doc")).distinct()
    return incoming_docs.join(per_doc, "in_doc", "left").select(
        "in_doc",
        F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
        "best_match",
        F.coalesce("best_n_match", F.lit(0)).alias("best_n_match"),
    )


# --------------------------------------------------------------------------


def timed_median(df) -> float:
    runs = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def ab(name, new_df, old_df):
    same = sorted(map(tuple, new_df.collect())) == \
        sorted(map(tuple, old_df.collect()))
    # warm both plans once, then strictly interleave the timed runs
    new_df.write.format("noop").mode("overwrite").save()
    old_df.write.format("noop").mode("overwrite").save()
    news, olds = [], []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        new_df.write.format("noop").mode("overwrite").save()
        news.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        old_df.write.format("noop").mode("overwrite").save()
        olds.append(time.perf_counter() - t0)
    n, o = statistics.median(news), statistics.median(olds)
    print(f"{name:12} identical={same}  new={n:6.3f}s  old={o:6.3f}s  "
          f"old/new={o / n:5.2f}x")
    return same


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {"recall", "paramscan", "sweep"}
    spark = get_spark(app_name="r10-form-ab")
    spark.range(1000).write.format("noop").mode("overwrite").save()
    ok = True
    if "paramscan" in which:
        ok &= ab("paramscan",
                 L.lsh_paramscan_report(spark, sf_dir),
                 old_paramscan(spark, sf_dir))
    if "recall" in which:
        ok &= ab("recall",
                 L.lsh_recall_tradeoff_report(spark, sf_dir),
                 old_recall(spark, sf_dir))
    if "sweep" in which:
        ok &= ab("sweep",
                 R.minhash_param_sweep(spark, sf_dir),
                 old_sweep(spark, sf_dir))
    if "increment" in which:
        from banking_etl_pipeline_spark.operators.curation import (
            dedup_incremental,
        )
        ok &= ab("increment",
                 dedup_incremental(spark, sf_dir),
                 old_dedup_incremental(spark, sf_dir))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
