"""Analysis operators — pyspark.ml equivalents of the reference's iAnalysis
(ref iFeatureOmegaCLI.py:9951-10310): clustering, dimensionality reduction,
feature normalization over a features-array DataFrame.

The reference runs sklearn on a driver-local matrix; here everything is a
distributed ml Pipeline over the `features array<double>` column produced
by `extract`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
from pyspark.ml.feature import PCA, MinMaxScaler, StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array


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
