"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — broadcast the (small) query set, one
pass over the corpus, per-group top-k window.  Scale path: IVF — partition
the corpus into `n_cells` Voronoi cells around seeded centroids (one
pandas-UDF assign pass), search only the `n_probe` closest cells per query.
All corpus-side work stays distributed; only centroids and queries are
broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

from ifeatureomega_cli_spark.operators.topk import top_k_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: query matrix broadcast into an Arrow UDF, one
    numpy matmul per corpus batch, window top-k on the scored pairs.

    (An all-JVM zip_with/aggregate variant exists in git history; higher-
    order functions evaluate interpreted at ~100× the cost of the Arrow
    matmul, so the Arrow path is the default.)"""
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Q = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-300)

    def gen(batches):
        for pdf in batches:
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-300)
            sims = C @ Q.T  # (batch, n_queries)
            n, m = sims.shape
            yield pd.DataFrame({
                query_id_col: np.tile(qids, n),
                id_col: np.repeat(pdf[id_col].to_numpy(), m),
                "cosine": sims.reshape(-1),
            })

    scored = corpus.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{query_id_col} long, {id_col} long, cosine double")
    return top_k_per_group(scored, [query_id_col], "cosine", k,
                           descending=True, tie_breakers=[id_col])


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 32,
    sample: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Mini k-means on a seeded driver sample → (n_cells, dim) centroids.

    The sample is HASH-ORDERED (xxhash64 over the vector bytes + seed,
    TakeOrdered top-N — per-partition top-k, no full sort shuffle), so it is
    uniform over the corpus regardless of storage layout.  A plain
    ``limit(sample)`` would take whatever partitions answer first; on a
    corpus written sorted/clustered by source — the normal 100 TB layout —
    that trains centroids on one corner of the distribution and collapses
    IVF recall."""
    rows = (
        corpus.select(vec_col)
        .withColumn("__h", F.xxhash64(F.col(vec_col), F.lit(seed)))
        .sort("__h").limit(sample).select(vec_col).collect()
    )
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    # k-means++ seeding (cosine space: d² = 2 − 2·max-sim) — a plain random
    # choice regularly merges two natural clusters into one cell, which
    # inflates that cell and starves another (bad for both recall and the
    # per-cell balance the probe-join relies on)
    C = X[[rng.randint(len(X))]]
    for _ in range(1, min(n_cells, len(X))):
        d2 = np.maximum(2.0 - 2.0 * (X @ C.T).max(axis=1), 0.0)
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(len(X), 1.0 / len(X))
        C = np.vstack([C, X[rng.choice(len(X), p=probs)]])
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / (np.linalg.norm(v) + 1e-12)
    return C


def ivf_assign(
    corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Attach nearest-centroid cell id (one Arrow pass; write this out
    partitioned by cell for repeated querying)."""
    C = centroids

    @pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return pd.Series((m @ C.T).argmax(axis=1).astype(np.int32))

    return corpus.withColumn(cell_col, _assign(F.col(vec_col)))


def ivf_topk(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_probe: int = 4,
    cell_col: str = "cell",
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """ANN top-k probing only the n_probe nearest cells per query.

    Small query sets (≤ max_broadcast_queries, bounded limit+count probe —
    mirroring knn_features' max_broadcast_train guard) take the broadcast
    kernel: the (query → probe cells) map is tiny and broadcast; the join
    prunes the corpus scan to matching cells (partition pruning if written
    by cell).  Candidate verification runs in the same Arrow matmul pattern
    as brute_force_topk — the query matrix rides in the UDF closure and each
    corpus batch is scored by one vectorized float64 gather+dot (interpreted
    higher-order zip_with/aggregate expressions measured ~100× slower).

    Bigger query tables dispatch to _ivf_topk_distributed, which never
    collects query vectors to the driver."""
    if (queries.limit(max_broadcast_queries + 1).count()
            > max_broadcast_queries):
        return _ivf_topk_distributed(
            corpus_with_cells, queries, centroids, vec_col, id_col,
            query_id_col, k, n_probe, cell_col)
    C = centroids
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        spark = corpus_with_cells.sparkSession
        return spark.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, cosine double, rk int")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Q = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-300)
    probe_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]

    spark = corpus_with_cells.sparkSession
    probe_df = spark.createDataFrame(
        [(int(q), int(c)) for q, row in zip(qids, probe_cells) for c in row],
        f"{query_id_col} long, {cell_col} int",
    )
    cand = corpus_with_cells.join(F.broadcast(probe_df), cell_col).select(
        query_id_col, id_col, vec_col
    )
    qindex = {int(q): i for i, q in enumerate(qids)}

    def gen(batches):
        for pdf in batches:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-300)
            qi = pdf[query_id_col].map(qindex).to_numpy(dtype=np.int64)
            cos = np.einsum("ij,ij->i", m, Q[qi])
            yield pd.DataFrame({query_id_col: pdf[query_id_col],
                                id_col: pdf[id_col], "cosine": cos})

    scored = cand.mapInPandas(
        gen, schema=f"{query_id_col} long, {id_col} long, cosine double")
    return top_k_per_group(scored, [query_id_col], "cosine", k,
                           descending=True, tie_breakers=[id_col])


def _ivf_topk_distributed(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int,
    n_probe: int,
    cell_col: str,
) -> DataFrame:
    """IVF top-k with NO driver-side query collect — the big-query twin.

    Only the (n_cells × dim) centroid matrix rides in closures.  One Arrow
    pass explodes each query into its n_probe (query_id, cell, qvec) probe
    rows; a shuffle join on cell pairs probes with corpus rows of that cell;
    one vectorized Arrow pass scores each pair.  Carrying the query vector on
    the probe rows doubles vector bytes through the join relative to a
    re-join on query_id afterwards, but saves that second shuffle — the
    right trade while n_probe is small.

    Scale note: the join key is `cell`, so shuffle parallelism is bounded
    by n_cells and popular cells skew their reducers — size n_cells ABOVE
    the cluster's target parallelism (the standard IVF sizing rule,
    n_cells ≈ √corpus, does this naturally) and keep AQE skew-join on
    (session default) so oversized cells are split at runtime."""
    C = centroids

    def probe_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Qn = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-300)
            cells = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]
            np_ = cells.shape[1]
            yield pd.DataFrame({
                query_id_col: np.repeat(
                    pdf[query_id_col].to_numpy(dtype=np.int64), np_),
                cell_col: cells.reshape(-1).astype(np.int32),
                "__qvec": [Q[i].tolist() for i in range(len(Q)) for _ in range(np_)],
            })

    q_cells = queries.select(query_id_col, vec_col).mapInPandas(
        probe_gen,
        schema=f"{query_id_col} long, {cell_col} int, __qvec array<double>")

    @pandas_udf(DoubleType())
    def _cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        Qm = np.stack([np.asarray(v, dtype=np.float64) for v in qv])
        Cm = np.stack([np.asarray(v, dtype=np.float64) for v in cv])
        Qm = Qm / (np.linalg.norm(Qm, axis=1, keepdims=True) + 1e-300)
        Cm = Cm / (np.linalg.norm(Cm, axis=1, keepdims=True) + 1e-300)
        return pd.Series(np.einsum("ij,ij->i", Qm, Cm))

    scored = (
        corpus_with_cells.select(id_col, vec_col, cell_col)
        .join(q_cells, cell_col)
        .withColumn("cosine", _cos(F.col("__qvec"), F.col(vec_col)))
        .select(query_id_col, id_col, "cosine")
    )
    return top_k_per_group(scored, [query_id_col], "cosine", k,
                           descending=True, tie_breakers=[id_col])
