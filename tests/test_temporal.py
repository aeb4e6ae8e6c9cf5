"""North-rule temporal guarantees over the synthetic revision tables:

* as-of join correctness vs a pandas merge_asof oracle;
* ZERO temporal leakage — adversarial future revisions must never change
  an as-of result at an earlier timestamp;
* per-row token-array-equality invariant between source revisions and the
  as-of-joined feature output;
* determinism across parallelism levels (local partition counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.data.synth import (
    feature_requests, sequence_revisions, sequences)
from ifeatureomega_cli_spark.operators.asof import asof_join
from ifeatureomega_cli_spark.functions.extract import extract

N_DOCS = 80


@pytest.fixture(scope="module")
def revs(spark):
    return sequence_revisions(spark, N_DOCS, max_revs=8).cache()


@pytest.fixture(scope="module")
def reqs(spark):
    return feature_requests(spark, N_DOCS, extra_unmatched_docs=5).cache()


def test_asof_matches_pandas_oracle(spark, revs, reqs):
    out = asof_join(reqs, revs.select("doc_id", "ts", "n_tok"), on="doc_id",
                    ts="ts", value_cols=["n_tok"]).toPandas()
    rp = revs.select("doc_id", "ts", "n_tok").toPandas().sort_values("ts")
    qp = reqs.toPandas().sort_values("ts")
    oracle = pd.merge_asof(
        qp, rp.rename(columns={"ts": "matched_ts", "n_tok": "n_tok_o"}),
        left_on="ts", right_on="matched_ts", by="doc_id", direction="backward",
    )
    got = out.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    exp = oracle.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["matched_ts"].astype("datetime64[us]").fillna(pd.Timestamp(0))
            == exp["matched_ts"].astype("datetime64[us]").fillna(pd.Timestamp(0))).all()
    gn = got["n_tok"].fillna(-1).to_numpy()
    en = exp["n_tok_o"].fillna(-1).to_numpy()
    assert (gn == en).all()


def test_zero_temporal_leakage(spark, revs, reqs):
    """Inject future revisions with wildly different payloads; results at
    earlier request timestamps must be identical."""
    base = asof_join(reqs, revs.select("doc_id", "ts", "n_tok"), on="doc_id",
                     ts="ts", value_cols=["n_tok"]).toPandas()
    far_future = revs.select("doc_id").distinct().withColumn(
        "ts", F.lit("2030-01-01 00:00:00").cast("timestamp")
    ).withColumn("n_tok", F.lit(999999))
    poisoned = revs.select("doc_id", "ts", "n_tok").unionByName(far_future)
    out = asof_join(reqs, poisoned, on="doc_id", ts="ts",
                    value_cols=["n_tok"]).toPandas()
    b = base.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    o = out.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert (b["n_tok"].fillna(-1).to_numpy() == o["n_tok"].fillna(-1).to_numpy()).all()
    assert not (o["n_tok"] == 999999).any()


def test_token_array_invariant_through_asof(spark, revs, reqs):
    """The tokens array delivered by the as-of join must equal the source
    revision's array element-for-element (checked via zip_with/forall —
    no collect of token payloads)."""
    out = asof_join(reqs, revs, on="doc_id", ts="ts",
                    value_cols=["tokens", "n_tok"])
    joined = out.filter(F.col("matched_ts").isNotNull()).alias("o").join(
        revs.alias("r"),
        (F.col("o.doc_id") == F.col("r.doc_id"))
        & (F.col("o.matched_ts") == F.col("r.ts")),
    )
    bad = joined.filter(
        (F.size("o.tokens") != F.size("r.tokens"))
        | ~F.forall(
            F.zip_with(F.col("o.tokens"), F.col("r.tokens"), lambda a, b: a == b),
            lambda x: x,
        )
    ).count()
    assert bad == 0


def test_extract_preserves_tokens_on_revisions(spark, revs):
    """Descriptor extraction over the revision table keeps (doc_id, ts,
    tokens) intact — the per-row invariant vs the source table."""
    feat = extract(revs, "protein:AAC")
    src = revs.select("doc_id", "ts", F.col("tokens").alias("t_src"))
    post = feat.select("doc_id", "ts", "tokens", "features")
    bad = post.join(src, ["doc_id", "ts"]).filter(
        ~F.forall(F.zip_with(F.col("tokens"), F.col("t_src"), lambda a, b: a == b),
                  lambda x: x)
    ).count()
    assert bad == 0
    assert feat.count() == revs.count()


def test_generation_deterministic_across_parallelism(spark):
    a = sequences(spark, 50, partitions=2).toPandas().sort_values("doc_id")
    b = sequences(spark, 50, partitions=7).toPandas().sort_values("doc_id")
    assert (a["n_tok"].to_numpy() == b["n_tok"].to_numpy()).all()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_fill_and_lag_on_revisions(spark, revs):
    from ifeatureomega_cli_spark.operators.fill import backfill, ffill
    from ifeatureomega_cli_spark.operators.lag_lead import lag_lead

    with_null = revs.withColumn(
        "v", F.when(F.col("n_tok") % 3 == 0, F.col("n_tok").cast("double"))
    )
    f = ffill(with_null, ["v"], on="doc_id", ts="ts").toPandas()
    pdf = with_null.select("doc_id", "ts", "v").toPandas().sort_values(["doc_id", "ts"])
    exp = pdf.groupby("doc_id")["v"].ffill()
    got = f.sort_values(["doc_id", "ts"])["v"].reset_index(drop=True)
    assert np.allclose(got.fillna(-1), exp.reset_index(drop=True).fillna(-1))

    b = backfill(with_null, ["v"], on="doc_id", ts="ts").toPandas()
    expb = pdf.groupby("doc_id")["v"].bfill()
    gotb = b.sort_values(["doc_id", "ts"])["v"].reset_index(drop=True)
    assert np.allclose(gotb.fillna(-1), expb.reset_index(drop=True).fillna(-1))

    ll = lag_lead(revs.select("doc_id", "ts", "n_tok"), ["n_tok"], [1, -1],
                  on="doc_id", ts="ts").toPandas().sort_values(["doc_id", "ts"])
    pdf2 = revs.select("doc_id", "ts", "n_tok").toPandas().sort_values(["doc_id", "ts"])
    assert np.allclose(
        ll["n_tok_lag1"].fillna(-1).to_numpy(),
        pdf2.groupby("doc_id")["n_tok"].shift(1).fillna(-1).to_numpy(),
    )
    assert np.allclose(
        ll["n_tok_lead1"].fillna(-1).to_numpy(),
        pdf2.groupby("doc_id")["n_tok"].shift(-1).fillna(-1).to_numpy(),
    )
