"""iAnalysis parity extras: sample-fit clusterers, imputation, t-SNE/LDA.

No sklearn/scipy in this environment (the reference loader stubs them), so
correctness is pinned by Adjusted-Rand-Index against PLANTED ground truth on
well-separated Gaussian blobs — the property the reference's sklearn calls
would also satisfy — plus reference-semantics replicas for the imputation /
MinMax NaN-fill quirks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def ari(a, b) -> float:
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    C = np.zeros((len(ua), len(ub)))
    np.add.at(C, (ia, ib), 1)
    comb = lambda x: x * (x - 1) / 2  # noqa: E731
    s_ij = comb(C).sum()
    s_a = comb(C.sum(1)).sum()
    s_b = comb(C.sum(0)).sum()
    exp = s_a * s_b / comb(n)
    mx = (s_a + s_b) / 2
    return float((s_ij - exp) / (mx - exp)) if mx != exp else 1.0


@pytest.fixture(scope="module")
def blobs(spark):
    """3 well-separated 8-dim Gaussian blobs, 80 points each."""
    rng = np.random.RandomState(5)
    centers = rng.normal(scale=6.0, size=(3, 8))
    rows = []
    truth = []
    i = 0
    for c_ix, c in enumerate(centers):
        for _ in range(80):
            rows.append((i, (c + rng.normal(scale=0.3, size=8)).tolist()))
            truth.append(c_ix)
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, features array<double>")
    return df.cache(), np.array(truth)


def _labels(df, truth_len):
    out = (df.select("doc_id", "cluster").toPandas()
           .sort_values("doc_id")["cluster"].to_numpy())
    assert len(out) == truth_len
    return out


def test_agglomerative_blobs(spark, blobs):
    from ifeatureomega_cli_spark.analysis import agglomerative

    df, truth = blobs
    lab = _labels(agglomerative(df, n_clusters=3), len(truth))
    assert ari(truth, lab) >= 0.9


def test_spectral_blobs(spark, blobs):
    from ifeatureomega_cli_spark.analysis import spectral

    df, truth = blobs
    lab = _labels(spectral(df, n_clusters=3, gamma=0.1), len(truth))
    assert ari(truth, lab) >= 0.9


def test_dbscan_blobs_and_noise(spark, blobs):
    from ifeatureomega_cli_spark.analysis import dbscan

    df, truth = blobs
    # a far outlier must land in noise (-1) via the predict path
    outlier = df.sparkSession.createDataFrame(
        [(999, [100.0] * 8)], "doc_id long, features array<double>")
    lab_df = dbscan(df.unionByName(outlier), eps=0.5, min_samples=5)
    pdf = lab_df.select("doc_id", "cluster").toPandas().set_index("doc_id")
    lab = pdf.loc[np.arange(len(truth))]["cluster"].to_numpy()
    core = lab >= 0
    assert core.mean() > 0.95
    assert ari(truth[core], lab[core]) >= 0.9
    assert pdf.loc[999]["cluster"] == -1


def test_affinity_propagation_blobs(spark, blobs):
    """damping=0.9 converges on the symmetric-blob fixture; the 0.5
    DEFAULT is sklearn/reference parity and oscillates on this input
    exactly as sklearn does (see np_cluster.affinity_propagation) — the
    default path is exercised in test_affinity_propagation_damping_exposed."""
    from ifeatureomega_cli_spark.analysis import affinity_propagation

    df, truth = blobs
    lab = _labels(affinity_propagation(df, damping=0.9), len(truth))
    assert ari(truth, lab) >= 0.9


def test_meanshift_blobs(spark, blobs):
    from ifeatureomega_cli_spark.analysis import meanshift

    df, truth = blobs
    lab = _labels(meanshift(df), len(truth))
    assert ari(truth, lab) >= 0.9


def test_mcl_blobs(spark, blobs):
    from ifeatureomega_cli_spark.analysis import mcl

    df, truth = blobs
    lab = _labels(mcl(df), len(truth))
    assert ari(truth, lab) >= 0.9


def test_hcluster_never_merges_blobs(spark, blobs):
    """fcluster(t=1, 'inconsistent') legitimately over-segments tight blobs;
    the invariant worth pinning is that no flat cluster spans two planted
    blobs and labels are 1-based like scipy's."""
    from ifeatureomega_cli_spark.analysis import hcluster

    df, truth = blobs
    lab = _labels(hcluster(df), len(truth))
    assert lab.min() >= 1
    for c in np.unique(lab):
        assert len(np.unique(truth[lab == c])) == 1


def test_out_of_sample_assignment(spark, blobs):
    """Fit capped below n: every row still gets a cluster, blob purity holds
    (the 1-NN assign path)."""
    from ifeatureomega_cli_spark.analysis import agglomerative

    df, truth = blobs
    lab = _labels(agglomerative(df, n_clusters=3, max_rows=60), len(truth))
    assert ari(truth, lab) >= 0.9


def test_impute_mean_matches_column_means(spark):
    """NaN cells → column mean (ref fill_ndarray :10303-10310); k-means on
    the imputed matrix must fit where the raw matrix would crash."""
    from ifeatureomega_cli_spark.analysis import impute_mean, kmeans

    rng = np.random.RandomState(0)
    m = rng.normal(size=(200, 6))
    nanmask = rng.random(m.shape) < 0.1
    m_nan = m.copy()
    m_nan[nanmask] = np.nan
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(m_nan)],
        "doc_id long, features array<double>")
    out = impute_mean(df)
    got = np.array(out.sort("doc_id").select("features").toPandas()
                   ["features"].tolist())
    col_means = np.nanmean(m_nan, axis=0)
    want = np.where(nanmask, col_means[None, :], m_nan)
    assert np.allclose(got, want, rtol=1e-12)
    assert not np.isnan(got).any()
    # the fit the reference would run after filling
    km = kmeans(out, 2)
    assert km.select("cluster").distinct().count() <= 2
    # raw NaN matrix crashes the ml fit — the gap impute_mean closes
    with pytest.raises(Exception):
        kmeans(df, 2).select("cluster").distinct().count()


def test_minmax_ref_constant_dim_row_fill(spark):
    """Constant dimension → 0/0 NaN → filled with the ROW's mean of the
    surviving normalized values (ref MinMax + fill_ndarray(data.T).T)."""
    from ifeatureomega_cli_spark.analysis import minmax_ref

    m = np.array([[0.0, 5.0, 1.0],
                  [1.0, 5.0, 3.0],
                  [2.0, 5.0, 5.0]])  # col 1 constant
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(m)],
        "doc_id long, features array<double>")
    got = np.array(minmax_ref(df).sort("doc_id").select("scaled_features")
                   .toPandas()["scaled_features"].tolist())
    # pandas replica of the reference math
    want = (m - m.min(0)) / np.where(m.max(0) - m.min(0) == 0, np.nan,
                                     m.max(0) - m.min(0))
    for i in range(len(want)):
        row = want[i]
        row[np.isnan(row)] = np.nanmean(row)
    assert np.allclose(got, want, rtol=1e-12)


def test_tsne_separates_blobs(spark, blobs):
    from ifeatureomega_cli_spark.analysis import tsne

    df, truth = blobs
    emb = (tsne(df, n_components=2).toPandas()
           .sort_values("doc_id"))
    Y = np.array(emb["tsne_features"].tolist())
    t = truth[emb["doc_id"].to_numpy()]
    intra = np.mean([np.linalg.norm(Y[t == c] - Y[t == c].mean(0), axis=1).mean()
                     for c in range(3)])
    inter = np.mean([np.linalg.norm(Y[t == a].mean(0) - Y[t == b].mean(0))
                     for a in range(3) for b in range(a + 1, 3)])
    assert inter / intra > 3.0


def test_lda_reduce_recovers_topics(spark):
    """Docs drawn from two disjoint vocab blocks → argmax topic separates
    them; out-of-sample rows transformed too (fit capped below n)."""
    from ifeatureomega_cli_spark.analysis import lda_reduce

    rng = np.random.RandomState(2)
    docs = np.zeros((60, 20))
    docs[:30, :10] = rng.poisson(5, (30, 10))
    docs[30:, 10:] = rng.poisson(5, (30, 10))
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(docs)],
        "doc_id long, features array<double>")
    out = (lda_reduce(df, n_components=2, max_rows=40).toPandas()
           .sort_values("doc_id"))
    theta = np.array(out["lda_features"].tolist())
    assert theta.shape == (60, 2)
    assert np.allclose(theta.sum(1), 1.0)
    top = theta.argmax(1)
    assert ari(np.repeat([0, 1], 30), top) >= 0.9


def test_column_stats_large_mean_no_cancellation(spark):
    """Regression for E[x²]−E[x]² float64 cancellation: a feature with
    |mean| ≫ std (mean 1e9, std 1) must still zscore to ±1-ish values, not
    collapse to all-zeros via std=0."""
    from ifeatureomega_cli_spark.analysis import _column_stats, zscore_ref

    rng = np.random.RandomState(7)
    vals = 1e9 + rng.normal(size=4000)
    df = spark.createDataFrame(
        [(i, [float(v), float(v) - 2e9]) for i, v in enumerate(vals)],
        "doc_id long, features array<double>").repartition(8)
    stats = _column_stats(df, "features")
    assert abs(stats["mean"][0] - vals.mean()) < 1e-3
    # two-pass numpy std is the ground truth the reference (np.std) uses
    assert np.allclose(stats["std"], [vals.std(), vals.std()], rtol=1e-6), \
        f"std collapsed: {stats['std']} vs {vals.std()}"
    z = (zscore_ref(df).select("doc_id", "scaled_features").toPandas()
         .sort_values("doc_id"))
    zm = np.stack(z["scaled_features"].to_numpy())
    assert 0.5 < np.abs(zm[:, 0]).mean() < 1.5  # real z-scores, not zeros
    assert np.allclose(zm[:, 0], (vals - vals.mean()) / vals.std(), atol=1e-5)


def test_linkage_matches_naive_lance_williams():
    """The cached-argmin _linkage rewrite must produce the same merges and
    heights as a brute-force alive×alive-rescan implementation (the
    round-2 version) on random data, for both ward and average linkage."""
    from ifeatureomega_cli_spark.functions.np_cluster import _linkage, _pairwise_sq

    def naive(X, method):
        n = len(X)
        big = np.full((2 * n - 1, 2 * n - 1), np.inf)
        big[:n, :n] = np.sqrt(_pairwise_sq(X))
        np.fill_diagonal(big, np.inf)
        alive = list(range(n))
        Z = np.zeros((n - 1, 4))
        sizes = np.concatenate([np.ones(n), np.zeros(n - 1)])
        for m in range(n - 1):
            sub = big[np.ix_(alive, alive)]
            ai, bi = divmod(int(np.argmin(sub)), len(alive))
            i, j = alive[ai], alive[bi]
            if i > j:
                i, j = j, i
            h = big[i, j]
            new = n + m
            ni, nj = sizes[i], sizes[j]
            Z[m] = [i, j, h, ni + nj]
            sizes[new] = ni + nj
            rest = [x for x in alive if x not in (i, j)]
            if rest:
                r = np.array(rest)
                dik, djk = big[i, r], big[j, r]
                if method == "ward":
                    nk = sizes[r]
                    d_new = np.sqrt(((ni + nk) * dik ** 2 + (nj + nk) * djk ** 2
                                     - nk * h ** 2) / (ni + nj + nk))
                else:
                    d_new = (ni * dik + nj * djk) / (ni + nj)
                big[new, r] = d_new
                big[r, new] = d_new
            alive = rest + [new]
        return Z

    rng = np.random.RandomState(3)
    for method in ("ward", "average"):
        X = rng.normal(size=(40, 5))
        Za = _linkage(X, method)
        Zb = naive(X, method)
        assert np.allclose(Za, Zb), f"linkage mismatch for {method}"


def test_affinity_propagation_damping_exposed(spark, blobs, monkeypatch):
    """The DEFAULT is now sklearn's damping=0.5 (the reference's exact
    parameterization); the knob must flow from the DataFrame API down to
    the numpy kernel so callers can force-converge with 0.9 on
    oscillation-prone data.  The default path must run deterministically
    end-to-end even when it does not converge (sklearn behavior: return
    the last iterate)."""
    from ifeatureomega_cli_spark import analysis as A
    from ifeatureomega_cli_spark.functions import np_cluster as NC

    df, truth = blobs
    seen = {}
    real = NC.affinity_propagation

    def spy(X, damping=0.5, **kw):
        seen["damping"] = damping
        return real(X, damping=damping, **kw)

    monkeypatch.setattr(NC, "affinity_propagation", spy)
    A.affinity_propagation(df, max_rows=120, damping=0.9).count()
    assert seen["damping"] == 0.9
    monkeypatch.undo()
    # default (0.5): runs, deterministic across invocations
    a = _labels(A.affinity_propagation(df, max_rows=120), len(truth))
    b = _labels(A.affinity_propagation(df, max_rows=120), len(truth))
    assert (a == b).all()
