"""Regression: engine descriptor output must be numpy.allclose to the
reference's (golden fixtures pinned by tools/make_golden.py).

Also checks column-name parity and the per-row token-array-equality
invariant (input tokens unchanged by extraction).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from ifeatureomega_cli_spark.functions.extract import extract, feature_names
from ifeatureomega_cli_spark.functions.registry import DESCRIPTORS

from tests.conftest import FIXDIR, GOLDDIR

TOKENS = {
    "protein": os.path.join(FIXDIR, "peptide_tokens.parquet"),
    "dna": os.path.join(FIXDIR, "dna_tokens.parquet"),
    "rna": os.path.join(FIXDIR, "rna_tokens.parquet"),
}


def _names_meta() -> dict:
    p = os.path.join(GOLDDIR, "names.json")
    return json.load(open(p)) if os.path.exists(p) else {}


def _cases():
    meta = _names_meta()
    cases = []
    for key in sorted(DESCRIPTORS):
        seq_type, desc = key.split(":", 1)
        slug = f"{seq_type}__{desc}".replace(" ", "_")
        gpath = os.path.join(GOLDDIR, slug + ".parquet")
        if os.path.exists(gpath):
            cases.append((key, gpath, meta.get(slug)))
    return cases


CASES = _cases()


@pytest.mark.parametrize("key,gpath,gnames", CASES, ids=[c[0] for c in CASES])
def test_descriptor_matches_reference(spark, key, gpath, gnames):
    seq_type = key.split(":", 1)[0]
    # RNA shares DNA kernels (SURVEY.md §2.5): map rna goldens onto dna specs
    tokens_path = TOKENS[seq_type]
    sdf = spark.read.parquet(tokens_path)

    out = extract(sdf, key).select("doc_id", "features").toPandas()
    gold = pd.read_parquet(gpath)

    out = out.set_index("doc_id").loc[gold["doc_id"].tolist()]
    got = np.array(out["features"].tolist(), dtype=np.float64)
    exp = np.array(gold["features"].tolist(), dtype=np.float64)

    assert got.shape == exp.shape, f"shape {got.shape} != golden {exp.shape}"
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12), (
        f"max abs diff {np.max(np.abs(got - exp))}"
    )
    if gnames is not None:
        L = int(sdf.limit(1).toPandas()["n_tok"][0]) if DESCRIPTORS[key].equal_length else 0
        mine = feature_names(key, length=L)
        assert mine == gnames, (
            f"feature names differ: first mismatch at "
            f"{next((i for i, (a, b) in enumerate(zip(mine, gnames)) if a != b), 'len')}"
            f" mine={mine[:5]} golden={gnames[:5]}"
        )


def test_token_invariant(spark):
    """Per-row token-array equality: extraction must not mutate tokens."""
    sdf = spark.read.parquet(TOKENS["protein"])
    out = extract(sdf, "protein:AAC")
    src = sdf.select("doc_id", "tokens").toPandas().set_index("doc_id")
    post = out.select("doc_id", "tokens").toPandas().set_index("doc_id")
    for d in src.index:
        assert np.array_equal(np.array(src.loc[d, "tokens"]), np.array(post.loc[d, "tokens"]))
