"""Cross-sample descriptors (PSTNP, KNN) vs reference goldens."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from ifeatureomega_cli_spark.operators.crosssample import knn_features, pstnp

from tests.conftest import FIXDIR, GOLDDIR


def _check(spark, tokens_file, golden_slug, fn):
    gpath = os.path.join(GOLDDIR, golden_slug + ".parquet")
    if not os.path.exists(gpath):
        pytest.skip(f"golden {golden_slug} missing")
    sdf = spark.read.parquet(os.path.join(FIXDIR, tokens_file))
    out = fn(sdf).select("doc_id", "features").toPandas().set_index("doc_id")
    gold = pd.read_parquet(gpath)
    got = np.array(out.loc[gold["doc_id"].tolist()]["features"].tolist())
    exp = np.array(gold["features"].tolist())
    assert got.shape == exp.shape, (got.shape, exp.shape)
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12), np.max(np.abs(got - exp))


def test_pstnpss_dna(spark):
    _check(spark, "dna_tokens.parquet", "dna__PSTNPss", lambda df: pstnp(df))


def test_pstnpds_dna(spark):
    _check(spark, "dna_tokens.parquet", "dna__PSTNPds",
           lambda df: pstnp(df, double_strand=True))


def test_pstnpss_rna(spark):
    _check(spark, "rna_tokens.parquet", "rna__PSTNPss", lambda df: pstnp(df))


def test_knn_protein(spark):
    _check(spark, "peptide_tokens.parquet", "protein__KNN",
           lambda df: knn_features(df, "protein"))


def test_knn_dna(spark):
    _check(spark, "dna_tokens.parquet", "dna__KNN",
           lambda df: knn_features(df, "dna"))


def test_knn_rna(spark):
    _check(spark, "rna_tokens.parquet", "rna__KNN",
           lambda df: knn_features(df, "dna"))
