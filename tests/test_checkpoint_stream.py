"""Checkpoint/resume lineage, skew helpers, streaming sessionization."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.data.synth import sequences
from ifeatureomega_cli_spark.functions.extract import extract
from ifeatureomega_cli_spark.plans.checkpoint import CheckpointedRun
from ifeatureomega_cli_spark.plans.partitioning import (
    bucket_by, length_tiered_repartition, two_phase_count)


def test_checkpoint_resume(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    src = sequences(spark, 60).cache()
    transform = lambda df: extract(df, "protein:AAC").select(
        "doc_id", "bucket", "features")

    run = CheckpointedRun(spark, out, n_buckets=8, waves=2)
    m1 = run.run(src, transform)
    assert m1["buckets_processed"] == 8 and m1["buckets_skipped"] == 0
    assert m1["rows"] == 60

    # resume: nothing left to do, output unchanged
    run2 = CheckpointedRun(spark, out, n_buckets=8, waves=2)
    m2 = run2.run(src, transform)
    assert m2["buckets_processed"] == 0 and m2["buckets_skipped"] == 8
    assert run2.read().count() == 60

    # simulate a partial failure: drop 3 buckets from manifest + data
    import pandas as pd
    man = spark.read.parquet(run.manifest_dir).toPandas()
    keep = man[~man["bucket"].isin([1, 2, 3])]
    shutil.rmtree(run.manifest_dir)
    spark.createDataFrame(keep).write.parquet(run.manifest_dir)
    run3 = CheckpointedRun(spark, out, n_buckets=8, waves=2)
    m3 = run3.run(src, transform)
    assert m3["buckets_processed"] == 3
    assert run3.read().count() == 60  # idempotent — no double counting
    # every doc exactly once
    assert run3.read().select("doc_id").distinct().count() == 60


def test_two_phase_count_matches_plain(spark):
    src = sequences(spark, 200)
    plain = {r["source"]: r["count"] for r in
             src.groupBy("source").count().collect()}
    skewsafe = {r["source"]: r["count"] for r in
                two_phase_count(src, "source").collect()}
    assert plain == skewsafe


def test_length_tiered_repartition_preserves_rows(spark):
    src = sequences(spark, 150)
    out = length_tiered_repartition(src)
    assert out.count() == 150
    assert sorted(out.columns) == sorted(src.columns)


def test_streaming_sessions_match_batch(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.sessionize import session_stats
    from ifeatureomega_cli_spark.streaming.sessions import streaming_session_stats

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src_dir = str(tmp_path / "events_in")
    ev.write.parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    sessions = streaming_session_stats(stream, 1800)
    q = (
        sessions.writeStream.format("memory").queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sess_out").toPandas()

    batch = session_stats(ev.select("user_id", "ts", "value"), 1800,
                          on="user_id", ts="ts", value="value").toPandas()
    assert len(got) == len(batch)
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    b = batch.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert (g["n_events"].to_numpy() == b["n_events"].to_numpy()).all()
    assert np.allclose(g["sum_value"].to_numpy(), b["sum_value"].to_numpy())


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates across micro-batches are
    dropped; keepers match the batch dedup."""
    import pandas as pd
    from ifeatureomega_cli_spark.operators.dedup import exact_dedup
    from ifeatureomega_cli_spark.streaming.dedup_stream import streaming_exact_dedup

    rows1 = [(i, f"text number {i % 20}") for i in range(40)]      # dups inside
    rows2 = [(100 + i, f"text number {i % 25}") for i in range(50)]  # dups across
    in_dir = str(tmp_path / "docs_in")
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append").parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    out = streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_out").toPandas()

    batch = exact_dedup(
        spark.read.parquet(in_dir)).toPandas()
    # one keeper per distinct digest; 25 distinct texts overall
    assert len(got) == len(batch) == 25
    assert set(got["digest"]) == set(batch["digest"])


def test_length_tier_equal_length_corpus_spreads(spark):
    """Regression for the same-length collapse: an EQUAL-length table (the
    exact shape of every A2/A3 positional-descriptor input) must spread over
    ≥ partitions_per_tier partitions within its tier — the old xxhash64(n_tok)
    intra-tier key sent every row of one length to ONE partition."""
    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"), F.lit(31).alias("n_tok"))
    out = length_tiered_repartition(df, partitions_per_tier=8,
                                    id_cols=["doc_id"])
    pids = (out.withColumn("pid", F.spark_partition_id())
            .select("pid").distinct().count())
    assert pids >= 8, f"equal-length corpus landed on {pids} partition(s)"
    # default (hash all columns) must spread too when rows are distinct
    out2 = length_tiered_repartition(df, partitions_per_tier=8)
    pids2 = (out2.withColumn("pid", F.spark_partition_id())
             .select("pid").distinct().count())
    assert pids2 >= 8
    assert out.count() == 20_000


def test_streaming_minhash_near_dup_matches_batch(spark, tmp_path):
    """Stateful streaming MinHash near-dup: clones arriving in LATER
    micro-batches are paired with their originals; the deduped pair set
    equals the batch minhash_dedup result on the closed corpus."""
    from ifeatureomega_cli_spark.operators.dedup import minhash_dedup
    from ifeatureomega_cli_spark.streaming.neardedup_stream import (
        streaming_minhash_pairs)

    def doc(i):
        return " ".join(f"w{i}x{j}" for j in range(12))

    rows1 = [(i, doc(i)) for i in range(30)]
    # batch 2: clones of docs 0..9 plus fresh docs
    rows2 = [(1000 + i, doc(i)) for i in range(10)] + \
            [(2000 + i, doc(500 + i)) for i in range(10)]
    in_dir = str(tmp_path / "near_in")
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append").parquet(in_dir)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)  # multi-micro-batch state use
              .parquet(in_dir))
    out = streaming_minhash_pairs(stream, threshold=0.8, bands=8)
    q = (out.writeStream.format("memory").queryName("near_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "near_ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "streaming query did not finish in 180s"
    # a pair agreeing in k bands arrives k times — sink-side dedup, as the
    # module documents
    got = spark.sql(
        "select id_a, id_b, max(est_jaccard) as est_jaccard "
        "from near_out group by id_a, id_b").toPandas()

    batch = minhash_dedup(
        spark.read.parquet(in_dir), threshold=0.8, bands=8).toPandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    batch_pairs = set(zip(batch["id_a"], batch["id_b"]))
    assert got_pairs == batch_pairs
    assert {(i, 1000 + i) for i in range(10)} <= got_pairs
    # agreement estimates identical to batch per pair
    ge = dict(zip(zip(got["id_a"], got["id_b"]), got["est_jaccard"]))
    be = dict(zip(zip(batch["id_a"], batch["id_b"]), batch["est_jaccard"]))
    assert all(abs(ge[p] - be[p]) < 1e-12 for p in got_pairs)


def test_streaming_minhash_bucket_saturation_bounds_state(spark, tmp_path):
    """A degenerate bucket (many identical docs) saturates at
    max_bucket_state and stops emitting — O(cap²) bounded, no blow-up."""
    from ifeatureomega_cli_spark.streaming.neardedup_stream import (
        streaming_minhash_pairs)

    rows = [(i, "same words everywhere " + "pad " * 8) for i in range(60)]
    in_dir = str(tmp_path / "sat_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    out = streaming_minhash_pairs(stream, threshold=0.8, bands=8,
                                  max_bucket_state=10)
    q = (out.writeStream.format("memory").queryName("sat_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sat_ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "streaming query did not finish in 180s"
    got = spark.sql(
        "select distinct id_a, id_b from sat_out").toPandas()
    # 10 stored docs → at most C(10,2)=45 pairs, never C(60,2)=1770
    assert 0 < len(got) <= 45


def test_streaming_simhash_matches_batch(spark, tmp_path):
    """SimHash streaming twin: cross-micro-batch pairs equal the batch
    operator's pair set with identical Hamming distances."""
    from ifeatureomega_cli_spark.operators.dedup import simhash_dup_pairs
    from ifeatureomega_cli_spark.streaming.neardedup_stream import (
        streaming_simhash_pairs)

    def doc(i):
        return " ".join(f"w{i}x{j}" for j in range(12))

    rows1 = [(i, doc(i)) for i in range(30)]
    rows2 = [(1000 + i, doc(i)) for i in range(10)]   # later-batch clones
    in_dir = str(tmp_path / "sim_in")
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append").parquet(in_dir)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))
    out = streaming_simhash_pairs(stream, max_hamming=3)
    q = (out.writeStream.format("memory").queryName("sim_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sim_ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "streaming query did not finish in 180s"
    got = spark.sql(
        "select id_a, id_b, min(hamming) as hamming "
        "from sim_out group by id_a, id_b").toPandas()

    batch = simhash_dup_pairs(
        spark.read.parquet(in_dir), max_hamming=3).toPandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == set(zip(batch["id_a"], batch["id_b"]))
    assert {(i, 1000 + i) for i in range(10)} <= got_pairs
    gh = dict(zip(zip(got["id_a"], got["id_b"]), got["hamming"]))
    bh = dict(zip(zip(batch["id_a"], batch["id_b"]), batch["hamming"]))
    assert all(gh[p] == bh[p] for p in got_pairs)


def test_streaming_simhash_bucket_saturation_bounds_state(spark, tmp_path):
    """SimHash twin's saturation cap pinned (same guarantee as the minhash
    twin's): a degenerate bucket keeps only max_bucket_state docs."""
    from ifeatureomega_cli_spark.streaming.neardedup_stream import (
        streaming_simhash_pairs)

    rows = [(i, "same words everywhere " + "pad " * 8) for i in range(60)]
    in_dir = str(tmp_path / "ssat_in")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    out = streaming_simhash_pairs(stream, max_hamming=3, max_bucket_state=10)
    q = (out.writeStream.format("memory").queryName("ssat_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssat_ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "streaming query did not finish in 180s"
    got = spark.sql("select distinct id_a, id_b from ssat_out").toPandas()
    # 10 stored docs → at most C(10,2)=45 pairs, never C(60,2)=1770
    assert 0 < len(got) <= 45
    # deterministic saturation: the kept docs are the 10 smallest ids
    assert set(got["id_a"]) | set(got["id_b"]) <= set(range(10))


def test_write_deduped_pairs_matches_batch_exactly(spark, tmp_path):
    """The foreachBatch dedup sink delivers each pair EXACTLY once even
    when it collides in several bands and spans micro-batches — the
    delivered parquet equals the batch operator's output with no
    sink-side DISTINCT."""
    from ifeatureomega_cli_spark.operators.dedup import minhash_dedup
    from ifeatureomega_cli_spark.streaming.neardedup_stream import (
        streaming_minhash_pairs, write_deduped_pairs)

    def doc(i):
        return " ".join(f"w{i}x{j}" for j in range(12))

    # exact clones collide in EVERY band (8 collisions per pair) — the
    # worst case for per-band duplicate emission
    rows1 = [(i, doc(i)) for i in range(20)]
    rows2 = [(1000 + i, doc(i)) for i in range(8)] + \
            [(2000 + i, doc(700 + i)) for i in range(8)]
    in_dir = str(tmp_path / "fbd_in")
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append").parquet(in_dir)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))
    out_dir = str(tmp_path / "fbd_out")
    q = write_deduped_pairs(
        streaming_minhash_pairs(stream, threshold=0.8, bands=8),
        out_dir, str(tmp_path / "fbd_ckpt"))
    assert q.awaitTermination(180), "streaming query did not finish in 180s"

    got = spark.read.parquet(out_dir).toPandas()
    batch = minhash_dedup(
        spark.read.parquet(in_dir), threshold=0.8, bands=8).toPandas()
    # exactly once: no per-band duplicates survive in the DELIVERED table
    assert len(got) == len(got.drop_duplicates(["id_a", "id_b"]))
    assert set(zip(got["id_a"], got["id_b"])) == \
        set(zip(batch["id_a"], batch["id_b"]))
    ge = dict(zip(zip(got["id_a"], got["id_b"]), got["est_jaccard"]))
    be = dict(zip(zip(batch["id_a"], batch["id_b"]), batch["est_jaccard"]))
    assert all(abs(ge[p] - be[p]) < 1e-12 for p in ge)
