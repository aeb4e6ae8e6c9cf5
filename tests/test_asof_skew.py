"""asof_join_skew must be exactly equivalent to the plain combinator —
including on a pathological hot entity — while sharding its sort."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.data.synth import feature_requests, sequence_revisions
from ifeatureomega_cli_spark.operators.asof import asof_join, asof_join_skew


def _norm(df):
    out = df.select("doc_id", "ts", "matched_ts", "n_tok").toPandas()
    out["matched_ts"] = out["matched_ts"].astype("datetime64[us]")
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out.sort_values(["doc_id", "ts"]).reset_index(drop=True)


def test_skew_asof_equals_plain(spark):
    revs = sequence_revisions(spark, 50, max_revs=10).select(
        "doc_id", "ts", "n_tok").cache()
    reqs = feature_requests(spark, 50, extra_unmatched_docs=5).cache()
    a = _norm(asof_join(reqs, revs, on="doc_id", ts="ts", value_cols=["n_tok"]))
    b = _norm(asof_join_skew(reqs, revs, on="doc_id", ts="ts",
                             value_cols=["n_tok"], n_buckets=7))
    assert len(a) == len(b)
    assert (a["matched_ts"].fillna(pd.Timestamp(0)).to_numpy()
            == b["matched_ts"].fillna(pd.Timestamp(0)).to_numpy()).all()
    assert (a["n_tok"].fillna(-1).to_numpy() == b["n_tok"].fillna(-1).to_numpy()).all()


def test_skew_asof_hot_entity(spark):
    """One entity with 20k revisions + sparse others; results must still be
    exactly the plain combinator's."""
    n_hot = 20_000
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("doc_id"),
        (F.lit("2024-01-01").cast("timestamp").cast("double")
         + F.col("id") * 60).cast("timestamp").alias("ts"),
        (F.col("id") % 997).cast("int").alias("n_tok"),
    )
    cold = sequence_revisions(spark, 20, max_revs=3).select("doc_id", "ts", "n_tok")
    revs = hot.unionByName(cold).cache()
    reqs = spark.range(500).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("D"), F.lpad((F.col("id") % 20).cast("string"), 10, "0")))
        .alias("doc_id"),
        (F.lit("2024-01-01").cast("timestamp").cast("double")
         + F.col("id") * 2400 + 30).cast("timestamp").alias("ts"),
    ).cache()
    a = _norm(asof_join(reqs, revs, on="doc_id", ts="ts", value_cols=["n_tok"]))
    b = _norm(asof_join_skew(reqs, revs, on="doc_id", ts="ts",
                             value_cols=["n_tok"], n_buckets=16))
    assert len(a) == len(b) == 500
    assert (a["matched_ts"].fillna(pd.Timestamp(0)).to_numpy()
            == b["matched_ts"].fillna(pd.Timestamp(0)).to_numpy()).all()
    assert (a["n_tok"].fillna(-1).to_numpy() == b["n_tok"].fillna(-1).to_numpy()).all()
