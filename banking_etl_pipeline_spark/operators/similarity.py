"""Approximate-nearest-neighbor search over the `embeddings` table (engine
extension, BASELINE.json north star).

Two tiers:
- `ann_brute_force` — exact cosine top-k per query via a broadcast
  nested-loop against the corpus. The correctness baseline (DuckDB-oracle
  checked); at scale this is the per-partition re-rank stage, not the scan.
- `ann_lsh` — banded sign-random-hyperplane LSH (the MinHash-LSH banding
  trick applied to sign hashes): every vector gets N_BANDS independent
  band signatures of BAND_BITS sign-bits each from deterministic
  md5-derived hyperplanes (functions/vectors.py); a pair is a candidate iff
  ANY band signature matches. Candidates come from an equi-join on
  (band_id, signature) after an explode — the sub-quadratic scale path
  (the join shuffles on the band key; at 100 TB you raise BAND_BITS with
  corpus size to keep buckets small and add bands to hold recall).
  Rows-only for the driver; tests/test_extensions.py checks its recall
  against the brute-force truth.

Cosine values are bit-identical across engines (sequential double folds both
sides), so rank ordering matches exactly with a vec_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import as_double, dot, hyperplane
from ..spec import QuerySpec

N_QUERIES = 10  # vectors with vec_id < 10 serve as the query set
TOP_K = 5
# Banded LSH geometry. Testdata embeddings are near-uniform (top-1 cosine
# ≈ 0.35 → P[bit match] ≈ 0.61 for true neighbors vs 0.5 for random), so
# 16 bands × 6 bits gives ~0.5 expected recall at ~0.2 candidate rate.
N_BANDS = 16
BAND_BITS = 6
EMBED_DIM = 64


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    return e.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))


def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _corpus(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (
        F.broadcast(q)
        .join(e, F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "cosine_sim")
    )


ANN_BRUTE_FORCE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine_sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (vector, band): deterministic sign-LSH band signatures.

    Band b's signature packs BAND_BITS sign bits (hyperplanes
    b*BAND_BITS .. b*BAND_BITS+BAND_BITS-1) into an int."""
    e = _corpus(spark, sf_dir)
    sigs = []
    for band in range(N_BANDS):
        sig = F.lit(0)
        for i in range(BAND_BITS):
            p = band * BAND_BITS + i
            sig = sig + F.when(
                dot(F.col("v"), hyperplane(p, EMBED_DIM)) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        sigs.append(F.struct(F.lit(band).alias("band"), sig.cast("int").alias("sig")))
    # Only (vec_id, band, sig) — never duplicate the vector N_BANDS times;
    # re-rank joins vectors back by id.
    return (
        e.withColumn("bs", F.explode(F.array(*sigs)))
        .select("vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH ANN: candidate pairs share at least one band signature,
    then exact cosine re-rank over the deduplicated candidate set. Rows-only
    (recall is probabilistic by design; tests assert recall ≥ threshold vs
    brute force)."""
    bands = lsh_bands(spark, sf_dir)
    qb = bands.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("band").alias("qband"),
        F.col("sig").alias("qsig"),
    )
    # Candidate ids only; dedup (q_id, vec_id) BEFORE scoring so each pair
    # is cosined once even when several bands collide.
    cand = (
        F.broadcast(qb)
        .join(
            bands,
            (F.col("qband") == F.col("band"))
            & (F.col("qsig") == F.col("sig"))
            & (F.col("q_id") != F.col("vec_id")),
        )
        .select("q_id", "vec_id")
        .distinct()
    )
    e = _corpus(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "cosine_sim")
    )


QUERIES: dict[str, QuerySpec] = {
    "ann_brute_force": QuerySpec(ann_brute_force, ANN_BRUTE_FORCE_SQL, "exact cosine top-k per query"),
    "ann_lsh": QuerySpec(ann_lsh, None, "sign-LSH bucketed ANN (rows-only; recall-tested)"),
}
