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


def _make_bucket_fn(n_hashes: int, threshold: float, max_bucket_state: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids_l, sigs_l, saturated = state.get
            ids = list(ids_l)
        else:
            ids, sigs_l, saturated = [], [], 0
        # preallocate the cap-sized signature matrix: no per-doc vstack
        # (O(n²) copies in the hot path), and the cap bounds state anyway
        sigs = np.empty((max_bucket_state, n_hashes), dtype=np.int64)
        if ids:
            n_known = len(ids)
            sigs[:n_known] = (np.array(sigs_l, dtype=np.int64)
                              .reshape(n_known, n_hashes))
        count = len(ids)
        known = set(ids)
        out_a, out_b, out_e = [], [], []
        # a group may span several pandas chunks within one micro-batch:
        # concat + sort ALL of them first so arrival order (and therefore
        # which docs a saturating bucket retains) is doc_id-deterministic,
        # never Arrow-chunking-dependent — same reason dedup_stream scans
        # all chunks before choosing its keeper
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (pd.concat(chunks, ignore_index=True)
                     if len(chunks) > 1 else chunks[0])
            whole = whole.sort_values("doc_id")
            for doc_id, sig in zip(whole["doc_id"], whole["sig"]):
                if pd.isna(doc_id):
                    raise ValueError(
                        "null doc_id reached the near-dup state operator — "
                        "a non-numeric id column silently nulls under "
                        "cast('long'); use integer ids")
                doc_id = int(doc_id)
                if saturated or doc_id in known:
                    continue
                s = np.asarray(sig, dtype=np.int64)
                if count:
                    agree = (sigs[:count] == s[None, :]).mean(axis=1)
                    hit = np.nonzero(agree >= threshold)[0]
                    for j in hit:
                        a, b = sorted((ids[j], doc_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(float(agree[j]))
                ids.append(doc_id)
                known.add(doc_id)
                sigs[count] = s
                count += 1
                if count >= max_bucket_state:
                    saturated = 1
        state.update((ids, [int(v) for v in sigs[:count].ravel()],
                      saturated))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "est_jaccard": out_e})

    return fn


_SIM_OUT_SCHEMA = StructType([
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
    StructField("hamming", IntegerType()),
])
_SIM_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sims", ArrayType(LongType())),
    StructField("saturated", IntegerType()),
])


def _make_simhash_bucket_fn(max_hamming: int, max_bucket_state: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids_l, sims_l, saturated = state.get
            ids = list(ids_l)
        else:
            ids, sims_l, saturated = [], [], 0
        # preallocated, uint64-viewed (fast-digest 64-bit simhashes are
        # stored as signed longs; view, don't convert, to keep the bits)
        arr = np.empty(max_bucket_state, dtype=np.uint64)
        count = len(ids)
        if count:
            arr[:count] = np.array(sims_l, dtype=np.int64).view(np.uint64)
        known = set(ids)
        out_a, out_b, out_h = [], [], []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (pd.concat(chunks, ignore_index=True)
                     if len(chunks) > 1 else chunks[0])
            whole = whole.sort_values("doc_id")
            for doc_id, sim in zip(whole["doc_id"], whole["simhash"]):
                if pd.isna(doc_id):
                    raise ValueError(
                        "null doc_id reached the simhash state operator — "
                        "use integer ids")
                doc_id, sim = int(doc_id), int(sim)
                if saturated or doc_id in known:
                    continue
                u = np.int64(sim).view(np.uint64)
                if count:
                    x = arr[:count] ^ u
                    # vectorized popcount: uint8 view + unpackbits
                    ham = np.unpackbits(
                        x.view(np.uint8).reshape(count, 8),
                        axis=1).sum(axis=1)
                    for j in np.nonzero(ham <= max_hamming)[0]:
                        a, b = sorted((ids[j], doc_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(int(ham[j]))
                ids.append(doc_id)
                known.add(doc_id)
                arr[count] = u
                count += 1
                if count >= max_bucket_state:
                    saturated = 1
        state.update((ids,
                      [int(v) for v in arr[:count].view(np.int64)],
                      saturated))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "hamming": out_h})

    return fn


def streaming_simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    digest: str = "fast",
    max_bucket_state: int = 200,
) -> DataFrame:
    """Streaming (id_a, id_b, hamming) pairs within Hamming ≤ max_hamming,
    matched incrementally against every previously seen document sharing a
    16-bit band (md5 variant: 15-bit) — the SimHash twin of
    streaming_minhash_pairs, same state/saturation/multi-band-emission
    semantics."""
    from ifeatureomega_cli_spark.operators.dedup import (
        simhash_band_expr, simhash_signatures)

    sigs = simhash_signatures(docs, text_col, id_col, shingle_n, digest,
                              parallelize=False)
    banded = sigs.select(
        F.col(id_col).cast("long").alias("doc_id"), "simhash",
        simhash_band_expr(digest))
    return (
        banded.groupBy("band", "key")
        .applyInPandasWithState(
            _make_simhash_bucket_fn(max_hamming, max_bucket_state),
            outputStructType=_SIM_OUT_SCHEMA,
            stateStructType=_SIM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_minhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,      # same default as batch minhash_dedup — the
    shingle_n: int = 3,   # pair-set parity claim requires matched banding
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
    from ifeatureomega_cli_spark.operators.dedup import minhash_band_expr

    banded = sigs.select(
        F.col(id_col).cast("long").alias("doc_id"), "sig",
        minhash_band_expr(bands))
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
