"""Streaming descriptor extraction: the same kernel UDF over readStream
must produce identical features to the batch path."""

from __future__ import annotations

import os

import numpy as np

from tests.conftest import FIXDIR


def test_streaming_extract_matches_batch(spark, tmp_path):
    from ifeatureomega_cli_spark.functions.extract import extract
    from ifeatureomega_cli_spark.streaming.sessions import streaming_extract

    src = spark.read.parquet(os.path.join(FIXDIR, "peptide_tokens.parquet"))
    in_dir = str(tmp_path / "stream_in")
    src.write.parquet(in_dir)

    stream = spark.readStream.schema(src.schema).parquet(in_dir)
    out = streaming_extract(stream.select("doc_id", "tokens"), "protein:AAC")
    q = (out.writeStream.format("memory").queryName("feat_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select doc_id, features from feat_stream").toPandas()

    exp = extract(src, "protein:AAC").select("doc_id", "features").toPandas()
    g = got.set_index("doc_id").loc[exp["doc_id"]]
    assert len(got) == len(exp) == 300
    assert np.allclose(np.array(g["features"].tolist()),
                       np.array(exp["features"].tolist()))
