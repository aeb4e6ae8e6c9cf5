"""Round-9 tests for the redesigned ngram_jaccard_pairs.

Pin the facts the optimization relies on: (a) the vectorized shingler
segments words exactly like the per-doc Python path, (b) the broadcast
kernel and the distributed instance plan produce identical results (and
identical to the legacy string self-join), (c) the shingling UDF executes
exactly once per query (the round-8 8×-re-execution regression, now
pinned behaviorally via an accumulator instead of a plan string).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    vocab = ["w%d" % i for i in range(40)]
    rows = []
    for i in range(200):
        words = [vocab[rng.randint(len(vocab))] for _ in range(50)]
        rows.append((i, " ".join(words)))
    # clones and near-clones so pairs exist at threshold
    for j in range(20):
        rows.append((1000 + j, rows[j][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_vectorized_shingler_matches_python(spark):
    import pyarrow as pa

    from ifeatureomega_cli_spark.operators.dedup import (
        _py_shingles, _word_hash_shingles)

    texts = [
        "a b c d e", "", "   ", "one two", "x  y   z w", "  lead trail  ",
        "a\tb\nc d", "A B C a b c", "same same same same",
        None, "single", "ä Ö ü ä ö Ü zz",
    ]
    arr = pa.array(texts, type=pa.string())
    for n in (1, 2, 3):
        flat, counts = _word_hash_shingles(arr, n)
        offs = np.concatenate(([0], np.cumsum(counts)))
        for i, t in enumerate(texts):
            expect = _py_shingles(t or "", n)
            got = flat[offs[i]:offs[i + 1]]
            assert len(got) == len(expect), (n, i, t)
            assert len(np.unique(got)) == len(got)  # per-row set semantics


def test_broadcast_and_instance_plans_identical(spark, corpus, monkeypatch):
    from ifeatureomega_cli_spark.operators import dedup as D

    def run():
        return (D.ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.3)
                .select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
                .sort("id_a", "id_b").collect())

    bcast = run()                       # default: broadcast kernel
    monkeypatch.setattr(D, "_NGRAM_BCAST_MAX_DOCS", 0)
    inst = run()                        # forced: distributed instance plan
    legacy = (D._ngram_jaccard_pairs_strjoin(
        corpus, "text", "doc_id", 3, 0.3, 200, True)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
        .sort("id_a", "id_b").collect())
    assert len(bcast) > 0
    assert bcast == inst == legacy


def test_instance_plan_unpacked_ids(spark, corpus, monkeypatch):
    """Negative / >2^31 ids disable int64 pair packing; results must not
    change (two-column aggregation branch)."""
    from ifeatureomega_cli_spark.operators import dedup as D

    monkeypatch.setattr(D, "_NGRAM_BCAST_MAX_DOCS", 0)
    shifted = corpus.withColumn("doc_id", F.col("doc_id") + (1 << 33))
    got = (D.ngram_jaccard_pairs(shifted, shingle_n=3, threshold=0.3)
           .select((F.col("id_a") - (1 << 33)).alias("id_a"),
                   (F.col("id_b") - (1 << 33)).alias("id_b"),
                   F.round("jaccard", 6).alias("j"))
           .sort("id_a", "id_b").collect())
    base = (D.ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.3)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
            .sort("id_a", "id_b").collect())
    assert got == base


def test_shingle_udf_runs_once(spark, corpus):
    """The persisted per-doc array table must make the shingling UDF run
    exactly once per query execution (round-8 found it running 8×)."""
    from ifeatureomega_cli_spark.operators import dedup as D

    acc = spark.sparkContext.accumulator(0)
    n_docs = corpus.count()
    D.ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.3,
                          _shingle_counter=acc).count()
    assert acc.value == n_docs, (
        f"shingle UDF processed {acc.value} rows for {n_docs} docs — "
        "re-execution regression")
