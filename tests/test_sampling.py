"""Unit + plan tests for the corpus-engineering operators
(banking_etl_pipeline_spark/operators/sampling.py): invariants the oracle
hash-compare can't express, plus the physical-plan properties that make them
scale (narrow chunker, top-k without a full sort)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from banking_etl_pipeline_spark.catalog import table
from banking_etl_pipeline_spark.operators.sampling import (
    CHUNK_CHARS,
    CHUNK_STRIDE,
    HEAVY_HITTERS_K,
    doc_chunking,
    heavy_hitters,
    sample_hash,
    train_val_test_split,
)
from banking_etl_pipeline_spark.plans import plan_of


def test_sample_hash_is_stable_and_roughly_sized(spark, sf_dir):
    a = sample_hash(spark, sf_dir)
    b = sample_hash(spark, sf_dir).repartition(3)
    n_total = table(spark, sf_dir, "lineitem").count()
    n_a = a.count()
    # stable under re-execution and re-partitioning: identical row sets
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a 5% hash sample should land within [2%, 8%] even at sf0.001
    assert 0.02 * n_total < n_a < 0.08 * n_total


def test_split_partitions_every_document_exactly_once(spark, sf_dir):
    rep = train_val_test_split(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert {r["split"] for r in rep} == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rep) == n_docs
    by = {r["split"]: r["n_docs"] for r in rep}
    assert by["train"] > by["val"] and by["train"] > by["test"]


def test_chunk_count_and_bounds_per_document(spark, sf_dir):
    chunks = doc_chunking(spark, sf_dir)
    got = (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.max("chunk_len").alias("max_len"))
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = got.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        expected = math.floor((r["n_chars"] - 1) / CHUNK_STRIDE) + 1
        assert r["n_chunks"] == expected, r
        assert r["max_len"] <= CHUNK_CHARS


def test_chunker_plan_is_narrow(spark, sf_dir):
    # explode+substr must not shuffle: no Exchange anywhere in the plan
    p = plan_of(doc_chunking(spark, sf_dir))
    assert "Exchange" not in p


def test_decontamination_probe_broadcasts(spark, sf_dir):
    from banking_etl_pipeline_spark.operators.dedup import decontamination

    # the benchmark-shingle probe must be a broadcast join: the corpus side
    # must not shuffle for it
    p = plan_of(decontamination(spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_heavy_hitters_topk_avoids_full_sort(spark, sf_dir):
    p = plan_of(heavy_hitters(spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # per-partition heap, not a global Sort
    # vocabulary at tiny SF can be smaller than k
    assert 0 < heavy_hitters(spark, sf_dir).count() <= HEAVY_HITTERS_K


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    from banking_etl_pipeline_spark.operators.windows import scd2_intervals

    rows = scd2_intervals(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval per user, and it is the last
        currents = [r for r in ivs if r["is_current"]]
        assert len(currents) == 1 and ivs[-1]["is_current"], user
        for prev, nxt in zip(ivs, ivs[1:]):
            # intervals chain without gaps or overlaps, and states alternate
            assert prev["valid_to"] == nxt["valid_from"], user
            assert prev["state"] != nxt["state"], user


def test_decontamination_never_flags_benchmark_docs(spark, sf_dir):
    from banking_etl_pipeline_spark.operators.dedup import (
        BENCH_MOD,
        decontamination,
    )
    from banking_etl_pipeline_spark.functions.hashing import md5_long

    out = decontamination(spark, sf_dir)
    # every output doc is a corpus (non-benchmark) doc with sane ratio
    flagged = out.withColumn(
        "bench",
        md5_long(F.concat(F.lit("bench:"), F.col("doc_id"))) % BENCH_MOD == 0,
    ).collect()
    assert flagged
    for r in flagged:
        assert not r["bench"], r
        assert 0 < r["n_shared"] <= r["n_shingles"], r
        assert 0.0 < r["contamination_ratio"] <= 1.0, r


def test_pack_sequences_stream_is_contiguous(spark, sf_dir):
    """Within each language stream, documents tile the token stream with no
    gaps or overlaps, and the packed-sequence bookkeeping is consistent."""
    from banking_etl_pipeline_spark.operators.sampling import (
        SEQ_LEN,
        pack_sequences,
    )

    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0 <= r["offset_in_seq"] < SEQ_LEN
        assert r["start_seq"] <= r["end_seq"]
        assert r["stream_offset"] % SEQ_LEN == r["offset_in_seq"]
        by_lang.setdefault(r["lang"], []).append(r)
    for docs in by_lang.values():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:
            assert r["stream_offset"] == off, "gap or overlap in token stream"
            off += r["n_tokens"]
