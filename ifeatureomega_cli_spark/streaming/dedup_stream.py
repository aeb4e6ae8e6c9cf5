"""Custom stateful streaming operator: incremental exact dedup.

`applyInPandasWithState` keeps one boolean per content digest; the first
arrival of a digest passes through, every later duplicate is dropped —
across micro-batches, restarts included (state lives in the checkpoint).

This is the streaming twin of operators/dedup.exact_dedup for the
"continuously arriving training documents" case.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

_OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("digest", StringType()),
])
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    seen = state.get[0] if state.exists else 0
    if seen:
        # already emitted in a previous micro-batch — drain and drop
        for _ in pdfs:
            pass
        state.update((seen,))
        return
    # a digest group may span several pandas chunks within one micro-batch:
    # scan ALL chunks for the global min doc_id before emitting, so the
    # keeper matches batch exact_dedup's min(doc_id) semantics exactly.
    best: pd.DataFrame | None = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.loc[[pdf["doc_id"].idxmin()], ["doc_id", "digest"]]
        if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
            best = cand
    if best is not None:
        state.update((1,))
        yield best
    else:
        state.update((seen,))


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Streaming DataFrame of first-seen documents (doc_id, digest)."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    return (
        keyed.groupBy("digest")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
