"""Custom stateful streaming operator: incremental MinHash near-dup
detection — the streaming twin of operators/dedup.minhash_dedup for the
"continuously arriving training documents" case.

Shape: signatures are a stateless Arrow UDF (identical kernel to batch),
band bucketing is the same JVM expression as minhash_lsh_candidates, and
`applyInPandasWithState` keyed on (band, bucket) keeps the signatures
seen so far in each bucket; every newly arriving doc is scored against
its bucket's history and pairs with signature agreement ≥ threshold are
emitted — across micro-batches, restarts included (state lives in the
checkpoint).

Documented deviations from the batch operator (inherent to append-mode
streaming):

* a pair colliding in SEVERAL bands is emitted once per band — batch
  dedups retroactively with .distinct(); dedup STREAM-SIDE is not
  offered because chaining dropDuplicates (itself stateful) after
  applyInPandasWithState trips the same columnar/UnsafeRow Spark bug as
  the pre-UDF repartition (see streaming_minhash_pairs) — dedup in the
  sink (SELECT DISTINCT on the delivered table / merge-on-write) or in
  a foreachBatch;
* the bucket-size cap cannot drop already-emitted pairs retroactively —
  a bucket that exceeds `max_bucket_state` simply STOPS accumulating and
  emitting (the batch twin drops the whole bucket), so degenerate
  buckets are still O(cap²) bounded.

State per bucket: ≤ max_bucket_state · (1 + n_hashes) longs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)

_OUT_SCHEMA = StructType([
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
    StructField("est_jaccard", DoubleType()),
])
# ids + flattened signatures + saturation flag
_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sigs", ArrayType(LongType())),
    StructField("saturated", IntegerType()),
])


def _band_exprs(bands: int):
    """The batch operator's banding expression (dedup.minhash_lsh_candidates):
    slice the signature into `bands` pieces, xxhash64 each to a bucket key."""
    return F.posexplode(
        F.transform(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.slice(
                    F.col("sig"),
                    bnd * (F.size(F.col("sig")) / bands).cast("int") + 1,
                    (F.size(F.col("sig")) / bands).cast("int"),
                ),
            ),
            lambda arr: F.xxhash64(
                F.concat_ws(",", F.transform(arr, lambda v: v.cast("string")))),
        )
    ).alias("band", "bucket")


def _make_bucket_fn(n_hashes: int, threshold: float, max_bucket_state: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids_l, sigs_l, saturated = state.get
            ids = list(ids_l)
            sigs = (np.array(sigs_l, dtype=np.int64)
                    .reshape(-1, n_hashes) if ids else
                    np.empty((0, n_hashes), dtype=np.int64))
        else:
            ids, sigs, saturated = [], np.empty((0, n_hashes),
                                                dtype=np.int64), 0
        known = set(ids)
        out_a, out_b, out_e = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # deterministic arrival order within the micro-batch
            pdf = pdf.sort_values("doc_id")
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                if saturated or doc_id in known:
                    continue
                s = np.asarray(sig, dtype=np.int64)
                if len(ids):
                    agree = (sigs == s[None, :]).mean(axis=1)
                    hit = np.nonzero(agree >= threshold)[0]
                    for j in hit:
                        a, b = sorted((int(ids[j]), int(doc_id)))
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(float(agree[j]))
                ids.append(int(doc_id))
                known.add(int(doc_id))
                sigs = np.vstack([sigs, s[None, :]])
                if len(ids) >= max_bucket_state:
                    saturated = 1
        state.update((ids, [int(v) for v in sigs.ravel()], saturated))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "est_jaccard": out_e})

    return fn


def streaming_minhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    digest: str = "fast",
    max_bucket_state: int = 200,
) -> DataFrame:
    """Streaming DataFrame of near-dup pairs (id_a, id_b, est_jaccard)
    with signature agreement ≥ threshold, matched incrementally against
    every previously seen document that shares a band bucket.  A pair
    agreeing in k bands arrives k times — dedup in the sink (see module
    docstring for why not here)."""
    from ifeatureomega_cli_spark.operators.dedup import minhash_signatures

    # parallelize=False: the round-robin streaming repartition hits a
    # Spark ColumnarBatchRow→UnsafeRow cast inside stateful queries; the
    # (band, bucket) groupBy exchange below spreads the work regardless
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_n,
                              seed, digest, parallelize=False)
    banded = sigs.select(
        F.col(id_col).cast("long").alias("doc_id"), "sig", _band_exprs(bands))
    return (
        banded.groupBy("band", "bucket")
        .applyInPandasWithState(
            _make_bucket_fn(n_hashes, threshold, max_bucket_state),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
