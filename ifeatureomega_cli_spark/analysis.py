"""Analysis operators — the reference's iAnalysis surface
(ref iFeatureOmegaCLI.py:9951-10382): clustering, dimensionality reduction,
feature normalization over a features-array DataFrame.

Two execution tiers, both honest about scale:

* **Distributed** (kmeans, BisectingKMeans, GaussianMixture, PCA, ZScore,
  MinMax, impute_mean, LDA transform) — pyspark.ml / aggregation pipelines
  over the full table; linear scans, scale-safe.
* **Sample-fit + distributed assign** (agglomerative, spectral, hcluster,
  DBSCAN, affinity propagation, mean shift, MCL, t-SNE) — these algorithms
  are inherently O(n²)–O(n³) driver-matrix computations in the reference
  (sklearn/scipy on the whole frame, :10053-10163); here the model is fit
  on a seeded hash-ordered sample capped at `max_rows`, then every row is
  assigned distributively by nearest fitted point in one Arrow pass.  The
  approximation is documented per function; sklearn/scipy are not available
  in this environment, so the kernels live in functions/np_cluster.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
from pyspark.ml.feature import PCA, MinMaxScaler, StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

from ifeatureomega_cli_spark.functions import np_cluster as NC


def _with_vec(df: DataFrame, features_col: str) -> DataFrame:
    return df.withColumn("__vec", array_to_vector(F.col(features_col)))


def kmeans(df: DataFrame, k: int, features_col: str = "features",
           seed: int = 42) -> DataFrame:
    """ref :10008-10021 (sklearn KMeans) → ml.clustering.KMeans."""
    v = _with_vec(df, features_col)
    model = KMeans(k=k, seed=seed, featuresCol="__vec").fit(v)
    return model.transform(v).withColumnRenamed("prediction", "cluster").drop("__vec")


def minibatch_kmeans(df: DataFrame, k: int, features_col: str = "features",
                     seed: int = 42) -> DataFrame:
    """ref :10023-10036 — approximated by BisectingKMeans (distributed)."""
    v = _with_vec(df, features_col)
    model = BisectingKMeans(k=k, seed=seed, featuresCol="__vec").fit(v)
    return model.transform(v).withColumnRenamed("prediction", "cluster").drop("__vec")


def gaussian_mixture(df: DataFrame, k: int, features_col: str = "features",
                     seed: int = 42) -> DataFrame:
    """ref :10038-10051 → ml.clustering.GaussianMixture."""
    v = _with_vec(df, features_col)
    model = GaussianMixture(k=k, seed=seed, featuresCol="__vec").fit(v)
    return (model.transform(v).withColumnRenamed("prediction", "cluster")
            .drop("__vec", "probability"))


def pca(df: DataFrame, n_components: int, features_col: str = "features") -> DataFrame:
    """ref :10183-10211 → ml.feature.PCA; output `pca_features array<double>`."""
    v = _with_vec(df, features_col)
    model = PCA(k=n_components, inputCol="__vec", outputCol="__pca").fit(v)
    return (model.transform(v)
            .withColumn("pca_features", vector_to_array("__pca"))
            .drop("__vec", "__pca"))


def zscore(df: DataFrame, features_col: str = "features") -> DataFrame:
    """ref :10270-10283 ZScore → StandardScaler (mean/stddev)."""
    v = _with_vec(df, features_col)
    model = StandardScaler(withMean=True, withStd=True, inputCol="__vec",
                           outputCol="__scaled").fit(v)
    return (model.transform(v)
            .withColumn("scaled_features", vector_to_array("__scaled"))
            .drop("__vec", "__scaled"))


def minmax(df: DataFrame, features_col: str = "features") -> DataFrame:
    """ref :10285-10301 MinMax → MinMaxScaler."""
    v = _with_vec(df, features_col)
    model = MinMaxScaler(inputCol="__vec", outputCol="__scaled").fit(v)
    return (model.transform(v)
            .withColumn("scaled_features", vector_to_array("__scaled"))
            .drop("__vec", "__scaled"))


# ---------------------------------------------------------------------------
# distributed feature-matrix statistics: imputation + reference MinMax
# ---------------------------------------------------------------------------


def _merge_moments(cnt, mean, m2, c_, m_, m2_):
    """Chan's parallel (count, mean, M2) merge, elementwise per dimension.
    Numerically stable: deviations are taken around each partial's own mean,
    so E[x²]−E[x]² cancellation (which collapses std to 0 when |mean| ≫ std)
    never occurs."""
    tot = cnt + c_
    safe = np.maximum(tot, 1.0)
    delta = m_ - mean
    mean = mean + delta * (c_ / safe)
    m2 = m2 + m2_ + delta * delta * (cnt * c_ / safe)
    return tot, mean, m2


def _column_stats(df: DataFrame, features_col: str) -> dict:
    """One distributed pass → per-dimension {mean, min, max, std} ignoring
    NaN.  Partial (count, mean, M2, min, max) per partition, Welford/Chan-
    merged on the driver — result is one small vector set, the map-side-
    combine classic.  M2 (sum of squared deviations AROUND THE PARTIAL MEAN)
    replaces a raw sum-of-squares: the one-pass E[x²]−E[x]² form loses all
    precision when |mean| ≫ std (float64 cancellation → std 0 → zscore_ref
    all-zeros, dbscan dividing by the 1.0 fallback)."""

    def partial(batches):
        cnt = mean = m2 = mn = mx = None
        for pdf in batches:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[features_col]])
            ok = ~np.isnan(m)
            c_ = ok.sum(axis=0).astype(np.float64)
            safe = np.maximum(c_, 1.0)
            m_ = np.where(ok, m, 0.0).sum(axis=0) / safe
            d = np.where(ok, m - m_[None, :], 0.0)
            m2_ = (d * d).sum(axis=0)
            mn_ = np.where(ok, m, np.inf).min(axis=0)
            mx_ = np.where(ok, m, -np.inf).max(axis=0)
            if cnt is None:
                cnt, mean, m2, mn, mx = c_, m_, m2_, mn_, mx_
            else:
                cnt, mean, m2 = _merge_moments(cnt, mean, m2, c_, m_, m2_)
                mn = np.minimum(mn, mn_); mx = np.maximum(mx, mx_)
        if cnt is None:
            return
        yield pd.DataFrame({"cnt": [cnt.tolist()], "mean": [mean.tolist()],
                            "m2": [m2.tolist()], "mn": [mn.tolist()],
                            "mx": [mx.tolist()]})

    parts = df.select(features_col).mapInPandas(
        partial, schema="cnt array<double>, mean array<double>, "
                        "m2 array<double>, mn array<double>, mx array<double>"
    ).collect()
    if not parts:
        return None  # empty input — callers short-circuit gracefully
    cnt = mean = m2 = mn = mx = None
    for r in parts:
        if cnt is None:
            cnt, mean, m2 = np.array(r["cnt"]), np.array(r["mean"]), np.array(r["m2"])
            mn, mx = np.array(r["mn"]), np.array(r["mx"])
        else:
            cnt, mean, m2 = _merge_moments(
                cnt, mean, m2,
                np.array(r["cnt"]), np.array(r["mean"]), np.array(r["m2"]))
            mn = np.minimum(mn, np.array(r["mn"]))
            mx = np.maximum(mx, np.array(r["mx"]))
    safe = np.maximum(cnt, 1.0)
    var = np.maximum(m2 / safe, 0.0)
    return {"mean": mean, "std": np.sqrt(var), "min": mn, "max": mx,
            "count": cnt}


def impute_mean(df: DataFrame, features_col: str = "features",
                out_col: str | None = None) -> DataFrame:
    """Replace NaN/NULL entries with the column (dimension) mean — the
    reference applies this via fill_ndarray (ref :10303-10310) so analysis
    fits never see NaN.  Two linear passes: one stats aggregation, one
    Arrow transform; nothing larger than a (dim,) vector leaves executors.
    A column that is ENTIRELY NaN has no mean and stays NaN — matching the
    reference (mean of an empty slice is NaN, fill_ndarray :10309)."""
    stats = _column_stats(df, features_col)
    out_col = out_col or features_col
    if stats is None:  # empty table: nothing to impute
        return df.withColumn(out_col, F.col(features_col))
    means = np.where(stats["count"] > 0, stats["mean"], np.nan)

    @pandas_udf(ArrayType(DoubleType()))
    def _fill(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bad = np.isnan(m)
        if bad.any():
            m[bad] = np.broadcast_to(means, m.shape)[bad]
        return pd.Series(list(m))

    return df.withColumn(out_col, _fill(F.col(features_col)))


def minmax_ref(df: DataFrame, features_col: str = "features") -> DataFrame:
    """Reference-faithful MinMax (ref :10285-10301): per-dimension
    (x−min)/(max−min); constant dimensions produce NaN which the reference
    then fills per SAMPLE with the row's own mean of surviving values
    (fill_ndarray on the transposed matrix).  Distributed: one stats pass,
    one Arrow transform."""
    stats = _column_stats(df, features_col)
    if stats is None:  # empty table
        return df.withColumn("scaled_features", F.col(features_col))
    mn, mx = stats["min"], stats["max"]
    span = mx - mn

    @pandas_udf(ArrayType(DoubleType()))
    def _mm(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        with np.errstate(invalid="ignore", divide="ignore"):
            out = (m - mn[None, :]) / span[None, :]
        bad = ~np.isfinite(out)
        if bad.any():
            good = np.where(bad, 0.0, out)
            ngood = (~bad).sum(axis=1, keepdims=True)
            rowmean = good.sum(axis=1, keepdims=True) / np.maximum(ngood, 1)
            out = np.where(bad, np.broadcast_to(rowmean, out.shape), out)
        return pd.Series(list(out))

    return df.withColumn("scaled_features", _mm(F.col(features_col)))


# ---------------------------------------------------------------------------
# sample-fit clusterers (reference :10053-10163; sklearn-on-driver in the
# reference, seeded-sample + distributed 1-NN assign here)
# ---------------------------------------------------------------------------


def _sample_rows(df: DataFrame, features_col: str, id_col: str,
                 max_rows: int, seed: int):
    """Deterministic pseudo-random sample: hash-order by id, take the first
    max_rows (TakeOrdered — per-partition top-k, no full sort shuffle).
    Returns (ids list, (n, dim) matrix); (None, None) on an empty table."""
    rows = (
        df.select(id_col, features_col)
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .sort("__h").limit(max_rows).select(id_col, features_col).collect()
    )
    if not rows:
        return None, None
    return ([r[0] for r in rows],
            np.stack([np.asarray(r[1], dtype=np.float64) for r in rows]))


def _sample_matrix(df: DataFrame, features_col: str, id_col: str,
                   max_rows: int, seed: int) -> np.ndarray | None:
    return _sample_rows(df, features_col, id_col, max_rows, seed)[1]


def _assign_nearest(df: DataFrame, features_col: str, Xs: np.ndarray,
                    labels: np.ndarray, out_col: str = "cluster") -> DataFrame:
    """Label every row with its nearest fitted sample point's cluster —
    one Arrow pass, the (max_rows × dim) sample rides in the closure."""
    lab = labels.astype(np.int32)

    @pandas_udf(IntegerType())
    def _nn(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((m * m).sum(1)[:, None] + (Xs * Xs).sum(1)[None, :]
              - 2.0 * (m @ Xs.T))
        return pd.Series(lab[d2.argmin(axis=1)])

    return df.withColumn(out_col, _nn(F.col(features_col)))


def _sample_fit_assign(df, fitter, features_col, id_col, max_rows, seed):
    Xs = _sample_matrix(df, features_col, id_col, max_rows, seed)
    if Xs is None:  # empty table
        return df.withColumn("cluster", F.lit(None).cast("int"))
    return _assign_nearest(df, features_col, Xs, fitter(Xs))


def agglomerative(df: DataFrame, n_clusters: int = 2,
                  features_col: str = "features", id_col: str = "doc_id",
                  max_rows: int = 1024, seed: int = 42) -> DataFrame:
    """ref :10053-10066 (sklearn AgglomerativeClustering, ward) —
    ward linkage on a seeded sample, 1-NN assign beyond it."""
    return _sample_fit_assign(
        df, lambda X: NC.agglomerative(X, n_clusters),
        features_col, id_col, max_rows, seed)


def spectral(df: DataFrame, n_clusters: int = 2, gamma: float = 1.0,
             features_col: str = "features", id_col: str = "doc_id",
             max_rows: int = 2048, seed: int = 42) -> DataFrame:
    """ref :10068-10081 (sklearn SpectralClustering defaults: RBF
    affinity, normalized-Laplacian embedding, k-means assign)."""
    return _sample_fit_assign(
        df, lambda X: NC.spectral(X, n_clusters, gamma=gamma, seed=seed),
        features_col, id_col, max_rows, seed)


def hcluster(df: DataFrame, t: float = 1.0,
             features_col: str = "features", id_col: str = "doc_id",
             max_rows: int = 1024, seed: int = 42) -> DataFrame:
    """ref :10098-10112 (scipy average linkage +
    fcluster(t=1, 'inconsistent'); 1-based labels like fcluster)."""
    return _sample_fit_assign(
        df, lambda X: NC.hcluster(X, t=t),
        features_col, id_col, max_rows, seed)


def affinity_propagation(df: DataFrame,
                         features_col: str = "features",
                         id_col: str = "doc_id", max_rows: int = 1024,
                         seed: int = 42, damping: float = 0.5) -> DataFrame:
    """ref :10114-10128 (sklearn AffinityPropagation defaults, incl.
    damping=0.5 — the reference's parameterization).

    Convergence caveat (shared with the reference, see
    np_cluster.affinity_propagation): damping 0.5 can oscillate on
    near-symmetric data; pass damping≈0.9 to force convergence there."""
    return _sample_fit_assign(
        df, lambda X: NC.affinity_propagation(X, damping=damping, seed=seed),
        features_col, id_col, max_rows, seed)


def meanshift(df: DataFrame, features_col: str = "features",
              id_col: str = "doc_id", max_rows: int = 2048,
              seed: int = 42) -> DataFrame:
    """ref :10130-10146 (estimate_bandwidth + MeanShift bin seeding; the
    reference falls back to all-zeros on failure — so do we)."""

    def _fit(X):
        try:
            return NC.mean_shift(X)
        except Exception:
            return np.zeros(len(X), dtype=np.int64)

    return _sample_fit_assign(df, _fit, features_col, id_col, max_rows, seed)


def mcl(df: DataFrame, expand_factor: int = 2, inflate_factor: float = 2.0,
        mult_factor: float = 2.0, max_loop: int = 1000,
        features_col: str = "features", id_col: str = "doc_id",
        max_rows: int = 1024, seed: int = 42) -> DataFrame:
    """ref :10083-10096 + MarkvCluster :10312-10382 (Markov clustering on
    the row-correlation graph)."""
    return _sample_fit_assign(
        df, lambda X: NC.mcl(X, expand_factor, inflate_factor, mult_factor,
                             max_loop),
        features_col, id_col, max_rows, seed)


def dbscan(df: DataFrame, eps: float = 0.5, min_samples: int = 5,
           features_col: str = "features", id_col: str = "doc_id",
           max_rows: int = 4096, seed: int = 42) -> DataFrame:
    """ref :10148-10161: StandardScaler on the matrix, then DBSCAN
    defaults.  Standardization stats come from a distributed pass over the
    FULL table (as the reference scales the full frame); the density fit
    runs on the sample; every row is then assigned DBSCAN-predict style —
    nearest CORE point within eps, else noise (-1)."""
    stats = _column_stats(df, features_col)
    if stats is None:  # empty table
        return df.withColumn("cluster", F.lit(-1).cast("int"))
    mean, std = stats["mean"], np.where(stats["std"] == 0, 1.0, stats["std"])
    Xs = _sample_matrix(df, features_col, id_col, max_rows, seed)
    Xs = (Xs - mean[None, :]) / std[None, :]
    labels, core = NC.dbscan(Xs, eps=eps, min_samples=min_samples)
    core_pts = Xs[core & (labels >= 0)]
    core_lab = labels[core & (labels >= 0)].astype(np.int32)

    @pandas_udf(IntegerType())
    def _nn(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = (m - mean[None, :]) / std[None, :]
        if len(core_pts) == 0:
            return pd.Series(np.full(len(m), -1, dtype=np.int32))
        d2 = ((m * m).sum(1)[:, None] + (core_pts * core_pts).sum(1)[None, :]
              - 2.0 * (m @ core_pts.T))
        best = d2.argmin(axis=1)
        lab = core_lab[best]
        lab = np.where(d2[np.arange(len(m)), best] <= eps * eps, lab, -1)
        return pd.Series(lab.astype(np.int32))

    return df.withColumn("cluster", _nn(F.col(features_col)))


# ---------------------------------------------------------------------------
# dimensionality reduction extras
# ---------------------------------------------------------------------------


def tsne(df: DataFrame, n_components: int = 2, perplexity: float = 30.0,
         features_col: str = "features", id_col: str = "doc_id",
         max_rows: int = 1024, seed: int = 42) -> DataFrame:
    """ref :10166-10181 (sklearn TSNE method='exact', learning_rate=100).
    t-SNE has no out-of-sample transform (sklearn's has none either) — the
    embedding is computed for the seeded sample and returned as
    (id, tsne_features); rows outside the sample are absent by design."""
    ids, X = _sample_rows(df, features_col, id_col, max_rows, seed)
    id_type = df.select(id_col).schema[0].dataType.simpleString()
    schema = f"{id_col} {id_type}, tsne_features array<double>"
    if ids is None:  # empty table
        return df.sparkSession.createDataFrame([], schema)
    Y = NC.tsne(X, n_components=n_components, perplexity=perplexity, seed=seed)
    return df.sparkSession.createDataFrame(
        [(i, y.tolist()) for i, y in zip(ids, Y)], schema)


def lda_reduce(df: DataFrame, n_components: int = 2,
               features_col: str = "features", id_col: str = "doc_id",
               max_rows: int = 4096, max_iter: int = 30,
               seed: int = 42) -> DataFrame:
    """ref :10198-10211 (sklearn LatentDirichletAllocation — the topic
    model).  Variational fit on a seeded sample (topic-word lambda is all
    that survives), then EVERY row is transformed distributively — per-doc
    inference is embarrassingly parallel, one Arrow pass."""
    Xs = _sample_matrix(df, features_col, id_col, max_rows, seed)
    if Xs is None:  # empty table
        return df.withColumn(
            "lda_features", F.lit(None).cast("array<double>"))
    lam = NC.lda_fit(Xs, n_components=n_components, max_iter=max_iter,
                     seed=seed)

    @pandas_udf(ArrayType(DoubleType()))
    def _tr(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        theta = NC.lda_transform(m, lam)
        return pd.Series(list(theta))

    return df.withColumn("lda_features", _tr(F.col(features_col)))


def zscore_ref(df: DataFrame, features_col: str = "features") -> DataFrame:
    """Reference-faithful ZScore (ref :10270-10283): per-dimension
    (x−mean)/std with POPULATION std (np.std, ddof=0); zero-variance
    dimensions become all-zero (the reference's explicit branch).  One
    distributed stats pass + one Arrow transform — unlike ml.StandardScaler
    this matches the reference's ddof and zero-std semantics exactly, which
    makes it DuckDB-oracleable (stddev_pop)."""
    stats = _column_stats(df, features_col)
    if stats is None:  # empty table
        return df.withColumn("scaled_features", F.col(features_col))
    mean, std = stats["mean"], stats["std"]

    @pandas_udf(ArrayType(DoubleType()))
    def _z(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.where(std[None, :] != 0,
                       (m - mean[None, :]) / np.where(std == 0, 1.0, std)[None, :],
                       0.0)
        return pd.Series(list(out))

    return df.withColumn("scaled_features", _z(F.col(features_col)))
