"""Heavy-tail robustness: long token arrays through tiered repartition and
bounded Arrow batches — the engine must neither OOM nor drop rows."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.data.synth import sequences
from ifeatureomega_cli_spark.functions.extract import extract
from ifeatureomega_cli_spark.plans.partitioning import length_tiered_repartition


def test_long_token_tail_extraction(spark):
    # median 512, tail to 8192 — ~40× the bench median
    df = sequences(spark, 300, median_len=512, max_len=8192).cache()
    stats = df.agg(F.max("n_tok"), F.expr("percentile(n_tok, 0.5)")).collect()[0]
    assert stats[0] > 2000  # the tail actually materialized

    tiered = length_tiered_repartition(df, tiers=(512, 2048, 4096))
    out = extract(tiered, "protein:CKSAAP type 1")
    pdf = out.select("doc_id", F.size("features").alias("d")).toPandas()
    assert len(pdf) == 300
    assert (pdf["d"] == 1600).all()

    # spot-check one long row against the kernel directly
    row = out.orderBy(F.desc("n_tok")).select("tokens", "features").head()
    from ifeatureomega_cli_spark.functions.kernels import Ragged
    from ifeatureomega_cli_spark.functions.registry import get_spec

    kern = get_spec("protein:CKSAAP type 1").kernel()
    exp = kern(Ragged.from_arrays(np.array([np.asarray(row["tokens"])], dtype=object)))[0]
    assert np.allclose(np.array(row["features"]), exp)


def test_sliding_window_chunked_memory_and_parity():
    """The A3 kernel must bound its transient one-hot cube: on a long-token
    batch, peak allocation beyond the (unavoidable) output array stays under
    256 MB, and chunked output equals the direct windowed computation."""
    import tracemalloc

    from ifeatureomega_cli_spark.functions.kernels import (
        Ragged, sliding_window_comp)

    rng = np.random.RandomState(0)
    n, L, V, w = 512, 2048, 20, 5
    r = Ragged.from_arrays([rng.randint(0, V, size=L) for _ in range(n)])
    tracemalloc.start()
    out = sliding_window_comp(r, V, w, denom="window")
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    output_bytes = out.nbytes
    assert peak - output_bytes < 256 << 20, (peak, output_bytes)
    # parity vs a direct (unchunked) windowed count on a row sample
    m = r.to_matrix()
    for i in (0, 17, n - 1):
        direct = np.stack([
            np.bincount(m[i, j:j + w], minlength=V) / w
            for j in range(L - w + 1)
        ]).reshape(-1)
        assert np.allclose(out[i], direct)
