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
