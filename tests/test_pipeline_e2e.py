"""Flagship north-rule pipeline, end-to-end:

    revisions (doc_id, ts, tokens) ──┐
                                     ├─ as-of join ─ extract(descriptor)
    requests  (doc_id, ts) ──────────┘
    → point-in-time feature vectors, verified allclose against a pandas
      merge_asof oracle + the (already reference-pinned) kernel, with the
      adversarial future-revision check on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.data.synth import feature_requests, sequence_revisions
from ifeatureomega_cli_spark.functions.extract import extract
from ifeatureomega_cli_spark.functions.registry import get_spec
from ifeatureomega_cli_spark.functions.kernels import Ragged
from ifeatureomega_cli_spark.operators.asof import asof_join


def test_point_in_time_descriptor_features(spark):
    revs = sequence_revisions(spark, 60, max_revs=6).cache()
    reqs = feature_requests(spark, 60, extra_unmatched_docs=4).cache()

    matched = asof_join(reqs, revs, on="doc_id", ts="ts",
                        value_cols=["tokens", "n_tok"])
    feats = extract(matched.filter(F.col("matched_ts").isNotNull()),
                    "protein:AAC")
    got = feats.select("doc_id", "ts", "matched_ts", "tokens", "features").toPandas()

    # oracle: pandas merge_asof picks the revision; the kernel (itself
    # golden-pinned vs the reference) computes the expected vector
    rp = revs.select("doc_id", "ts", "tokens").toPandas().sort_values("ts")
    qp = reqs.toPandas().sort_values("ts")
    oracle = pd.merge_asof(qp, rp.rename(columns={"ts": "matched_ts"}),
                           left_on="ts", right_on="matched_ts", by="doc_id")
    oracle = oracle[oracle["matched_ts"].notna()]
    kern = get_spec("protein:AAC").kernel()
    exp_feats = kern(Ragged.from_arrays(
        np.array([np.asarray(t) for t in oracle["tokens"]], dtype=object)))

    got_idx = got.set_index(["doc_id", "ts"])
    assert len(got) == len(oracle)
    exp_keys = list(zip(oracle["doc_id"], oracle["ts"]))
    g = got_idx.loc[exp_keys]
    # 1) matched revision timestamps agree
    assert (g["matched_ts"].to_numpy().astype("datetime64[us]")
            == oracle["matched_ts"].to_numpy().astype("datetime64[us]")).all()
    # 2) token-array invariant: delivered tokens == the oracle revision's
    for a, b in zip(g["tokens"], oracle["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # 3) feature vectors allclose
    assert np.allclose(np.array(g["features"].tolist()), exp_feats,
                       rtol=1e-9, atol=1e-12)

    # 4) zero temporal leakage: future revisions don't change anything
    poisoned = revs.select("doc_id", "ts", "tokens", "n_tok").unionByName(
        revs.select("doc_id", "tokens", "n_tok").withColumn(
            "ts", F.lit("2031-01-01").cast("timestamp")).withColumn(
            "tokens", F.array(*[F.lit(0)] * 8)).withColumn("n_tok", F.lit(8))
        .select("doc_id", "ts", "tokens", "n_tok")
    )
    feats2 = extract(
        asof_join(reqs, poisoned, on="doc_id", ts="ts",
                  value_cols=["tokens", "n_tok"])
        .filter(F.col("matched_ts").isNotNull()), "protein:AAC")
    got2 = feats2.select("doc_id", "ts", "features").toPandas()
    g2 = got2.set_index(["doc_id", "ts"]).loc[exp_keys]
    assert np.allclose(np.array(g2["features"].tolist()),
                       np.array(g["features"].tolist()))
