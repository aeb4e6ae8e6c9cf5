"""Streaming twin of the multimodal feature extractor.

`extract_media_features` is a stateless mapInPandas over binary
payloads, so the SAME operator must run unchanged on a readStream and
produce byte-identical rows to the batch path — the "continuously
arriving scraped media" case.  The payload mix covers every real
decoder family (WAV, BMP, PNG, baseline + lossless + hierarchical +
CMYK JPEG, GIF) plus a stub-fallback row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _media_rows():
    from ifeatureomega_cli_spark.operators.gif import encode_gif
    from ifeatureomega_cli_spark.operators.jpeg import (
        encode_jpeg, encode_jpeg_adobe, encode_jpeg_hierarchical,
        encode_jpeg_lossless)
    from ifeatureomega_cli_spark.operators.multimodal import (
        encode_bmp, encode_png, encode_wav)

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint16)
    cmyk = np.zeros((16, 16, 4), dtype=np.uint8)
    cmyk[:, :] = [200, 150, 100, 255]
    wav = np.sin(np.linspace(0, 40, 800))
    payloads = [
        encode_wav(wav, 8000),
        encode_bmp(rgb.astype(np.uint8)),
        encode_png(rgb.astype(np.uint8)),
        encode_jpeg(rgb.astype(np.uint8)),
        encode_jpeg_lossless(rgb, bits=8),
        encode_jpeg_hierarchical(rgb, levels=2, lossless=True, bits=8),
        encode_jpeg_adobe(cmyk),
        encode_gif(rgb.astype(np.uint8)),
        b"\x00\x01\x02 not media at all \x03",
    ]
    return pd.DataFrame({
        "media_id": range(len(payloads)),
        "kind": ["media"] * len(payloads),
        "payload": [bytes(p) for p in payloads],
    })


def test_streaming_media_features_match_batch(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.multimodal import (
        extract_media_features)

    pdf = _media_rows()
    src = spark.createDataFrame(pdf)
    in_dir = str(tmp_path / "media_in")
    src.repartition(2).write.parquet(in_dir)
    batch_src = spark.read.parquet(in_dir)
    stream = spark.readStream.schema(batch_src.schema).parquet(in_dir)

    q = (extract_media_features(stream, out_dim=8)
         .writeStream.format("memory").queryName("s_media")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_media"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.sql("select * from s_media").toPandas()
           .sort_values("media_id").reset_index(drop=True))
    exp = (extract_media_features(batch_src, out_dim=8).toPandas()
           .sort_values("media_id").reset_index(drop=True))
    assert len(got) == len(exp) == len(pdf)
    # every real decoder family took its real path in BOTH modes
    assert sorted(set(exp["decode_path"])) == sorted(set(got["decode_path"]))
    assert "stub" in set(got["decode_path"])          # the junk row
    assert (got["decode_path"] != "stub").sum() == len(pdf) - 1
    pd.testing.assert_frame_equal(
        got.drop(columns=["feature"]), exp.drop(columns=["feature"]),
        check_dtype=False)
    for g, e in zip(got["feature"], exp["feature"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=0, atol=0)
