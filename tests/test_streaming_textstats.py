"""Streaming twins of the text-analysis operators.

textstats are stateless column expressions, so the SAME operator functions
must run unchanged on a readStream and produce byte-identical rows to the
batch path; the composed quality-gate → stateful-dedup pipeline must match
its batch equivalent (min doc_id keeper per digest among passing docs).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _stream_docs(spark, tmp_path):
    src = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    in_dir = str(tmp_path / "docs_in")
    # two files → at least two micro-batch inputs under availableNow
    src.repartition(2).write.parquet(in_dir)
    return src, spark.readStream.schema(src.schema).parquet(in_dir)


def _run(stream_out, tmp_path, name):
    q = (stream_out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_streaming_textstats_match_batch(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.textstats import (
        fingerprint, language_id, text_quality, token_count)

    src, stream = _stream_docs(spark, tmp_path)
    for name, op, cols in (
        ("tq", text_quality, ["n_chars", "n_words", "alpha_ratio"]),
        ("tc", token_count, ["n_ws_tokens", "n_tokens_est"]),
        ("li", language_id, ["lang_pred", "score_en"]),
        ("fp", fingerprint, ["fingerprint", "n_windows"]),
    ):
        _run(op(stream).select("doc_id", *cols), tmp_path, f"s_{name}")
        got = (spark.sql(f"select * from s_{name}").toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        exp = (op(src).select("doc_id", *cols).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_streaming_quality_dedup_matches_batch(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.dedup import exact_dedup
    from ifeatureomega_cli_spark.operators.textstats import text_quality
    from ifeatureomega_cli_spark.streaming.pipeline import (
        streaming_quality_dedup)

    src, stream = _stream_docs(spark, tmp_path)
    _run(streaming_quality_dedup(stream, min_words=5, min_alpha_ratio=0.5),
         tmp_path, "s_qd")
    got = spark.sql("select doc_id, digest from s_qd").toPandas()

    gated = text_quality(src, keep_text=True).filter(
        (F.col("n_words") >= 5) & (F.col("alpha_ratio") >= 0.5))
    exp = (exact_dedup(gated).select(F.col("keeper_id").alias("doc_id"),
                                     "digest").toPandas())
    assert len(got) == len(exp) > 0
    g = got.sort_values("digest").reset_index(drop=True)
    e = exp.sort_values("digest").reset_index(drop=True)
    assert (g["digest"] == e["digest"]).all()
    # keeper = min doc_id per digest, matching the batch operator exactly
    assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()
