"""Deterministic synthetic sequence tables (FIXTURES.md F1/F2/F3).

Generation is a pure function of (seed, doc index) — computed distributed
via mapInPandas over spark.range, so the same (seed, n) always yields the
same table regardless of partitioning, executor count, or row order.  This
is what makes checkpoint-resume and the two-parallelism scaling benchmark
byte-for-byte comparable.

F1  sequences:          (doc_id, tokens, n_tok, source) — lognormal lengths
                        (median ~64, tail to max_len) + one hot source (~70%)
                        to exercise skew handling.
F2  sequence_revisions: (doc_id, ts, tokens, n_tok, source) — ~20% of docs
                        get 2..max_revs revisions; each revision point-
                        mutates the previous one; ts strictly increasing.
F3  feature_requests:   (doc_id, ts) — uniform over F2's time range,
                        including ids with no prior revision (null case).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
SPAN_SECONDS = 90 * 24 * 3600  # 90 days of revisions

_SOURCES = ["src_a", "src_b", "src_c", "src_d", "src_e"]
_SOURCE_P = [0.70, 0.12, 0.08, 0.06, 0.04]  # hot source skew


def _rng_for(seed: int, doc: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=(seed << 32) ^ doc))


def sequences(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab: int = 20,
    median_len: int = 64,
    max_len: int = 4096,
    gap_rate: float = 0.01,
    partitions: int | None = None,
) -> DataFrame:
    """F1 tokenized sequences table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "tokens": [], "n_tok": [], "source": []}
            for doc in pdf["id"]:
                g = _rng_for(seed, int(doc))
                L = int(np.clip(g.lognormal(np.log(median_len), 1.0), 8, max_len))
                toks = g.integers(0, vocab, size=L).astype(np.int32)
                gaps = g.random(L) < gap_rate
                toks[gaps] = vocab  # gap token id
                rows["doc_id"].append(f"D{int(doc):010d}")
                rows["tokens"].append(toks.tolist())
                rows["n_tok"].append(L)
                rows["source"].append(
                    _SOURCES[int(g.choice(len(_SOURCES), p=_SOURCE_P))]
                )
            yield pd.DataFrame(rows)

    base = spark.range(n_docs, numPartitions=partitions)
    return base.mapInPandas(
        gen, schema="doc_id string, tokens array<int>, n_tok int, source string"
    )


def sequence_revisions(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab: int = 20,
    median_len: int = 64,
    max_len: int = 4096,
    rev_fraction: float = 0.2,
    max_revs: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """F2 timestamped revisions; first revision equals the F1 row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "ts": [], "tokens": [], "n_tok": [], "source": []}
            for doc in pdf["id"]:
                g = _rng_for(seed, int(doc))
                L = int(np.clip(g.lognormal(np.log(median_len), 1.0), 8, max_len))
                toks = g.integers(0, vocab, size=L).astype(np.int32)
                src = _SOURCES[int(g.choice(len(_SOURCES), p=_SOURCE_P))]
                n_revs = 1
                if g.random() < rev_fraction:
                    n_revs = int(g.integers(2, max_revs + 1))
                t0 = float(g.random()) * SPAN_SECONDS * 0.5
                t = t0
                cur = toks
                for r in range(n_revs):
                    rows["doc_id"].append(f"D{int(doc):010d}")
                    rows["ts"].append(EPOCH + np.timedelta64(int(t * 1e6), "us"))
                    rows["tokens"].append(cur.tolist())
                    rows["n_tok"].append(len(cur))
                    rows["source"].append(src)
                    # next revision: point mutations + occasional length change
                    cur = cur.copy()
                    n_mut = max(1, int(len(cur) * 0.05))
                    idx = g.integers(0, len(cur), size=n_mut)
                    cur[idx] = g.integers(0, vocab, size=n_mut)
                    if g.random() < 0.2:
                        delta = int(g.integers(-4, 5))
                        if delta > 0:
                            cur = np.concatenate(
                                [cur, g.integers(0, vocab, size=delta).astype(np.int32)]
                            )
                        elif delta < 0 and len(cur) + delta >= 8:
                            cur = cur[:delta]
                    # inter-arrival mixture: seconds … days
                    t += float(np.exp(g.uniform(np.log(30), np.log(5 * 24 * 3600))))
            yield pd.DataFrame(rows)

    base = spark.range(n_docs, numPartitions=partitions)
    return base.mapInPandas(
        gen,
        schema="doc_id string, ts timestamp, tokens array<int>, n_tok int, source string",
    )


def feature_requests(
    spark: SparkSession,
    n_docs: int,
    requests_per_doc: int = 2,
    seed: int = 43,
    extra_unmatched_docs: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """F3 point-in-time request grid (doc_id, ts)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "ts": []}
            for doc in pdf["id"]:
                g = _rng_for(seed, int(doc))
                for _ in range(requests_per_doc):
                    t = float(g.random()) * SPAN_SECONDS * 1.1 - SPAN_SECONDS * 0.05
                    rows["doc_id"].append(f"D{int(doc):010d}")
                    rows["ts"].append(EPOCH + np.timedelta64(int(t * 1e6), "us"))
            yield pd.DataFrame(rows)

    base = spark.range(n_docs + extra_unmatched_docs, numPartitions=partitions)
    return base.mapInPandas(gen, schema="doc_id string, ts timestamp")
