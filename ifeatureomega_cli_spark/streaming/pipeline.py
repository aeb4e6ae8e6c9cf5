"""Composed streaming ingest pipeline for continuously-arriving training
documents: quality gate → incremental exact dedup.

The textstats operators (operators/textstats.py) are stateless column
expressions, so they apply to a streaming DataFrame unchanged; the dedup
stage is the stateful applyInPandasWithState operator from
streaming/dedup_stream.py.  This module just pins the composition the
batch pipeline uses (filter on quality, keep first arrival per digest) so
streaming and batch stay semantically twinned — see
tests/test_streaming_textstats.py for the equivalence proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.operators.textstats import text_quality
from ifeatureomega_cli_spark.streaming.dedup_stream import streaming_exact_dedup


def streaming_quality_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """Streaming (doc_id, digest) of first-seen documents that pass the
    quality gate.  Stateless quality columns run inline per micro-batch;
    only the dedup state (one flag per digest) persists in the checkpoint."""
    gated = text_quality(docs, text_col=text_col, keep_text=True).filter(
        (F.col("n_words") >= min_words)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    )
    return streaming_exact_dedup(gated, text_col=text_col, id_col=id_col)
