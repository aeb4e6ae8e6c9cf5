"""High-level façade mirroring the reference's user workflow
(iFeatureOmegaCLI.py: iProtein/iDNA/iRNA classes) on Spark.

Reference usage                         →  Spark-native equivalent
-----------------------------------------------------------------
p = iProtein("x.fasta")                 →  p = ProteinDataset(spark, "x.fasta")
p.import_parameters("Protein_...json")  →  p.import_parameters("Protein_...json")
p.get_descriptor("AAC")                 →  df = p.get_descriptor("AAC")
p.encodings                             →  df (lazy DataFrame, features array)
p.to_csv("enc.csv")                     →  p.to_csv(df, "out_dir")
p.display_feature_types()               →  p.display_feature_types()

The DataFrame stays lazy/distributed; `.to_pandas_matrix()` collects the
reference-shaped pandas frame (SampleName index × named columns) for
drop-in parity at small scale.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ifeatureomega_cli_spark.functions.extract import extract, feature_names
from ifeatureomega_cli_spark.functions.registry import descriptor_names, get_spec
from ifeatureomega_cli_spark import sinks


class SequenceDataset:
    seq_type = "protein"

    def __init__(self, spark: SparkSession, source: str | DataFrame):
        """`source`: a FASTA path, a parquet path of a tokenized table, or a
        DataFrame with (doc_id, tokens, n_tok, ...)."""
        self.spark = spark
        if isinstance(source, DataFrame):
            self.df = source
        elif str(source).endswith((".parquet", "/")) :
            self.df = spark.read.parquet(str(source))
        else:
            from ifeatureomega_cli_spark.sources.fasta import read_fasta

            self.df = read_fasta(spark, str(source), seq_type=self.seq_type)
        self._params: dict[str, dict] = {}

    # -- reference-parity surface --------------------------------------

    def import_parameters(self, path: str) -> bool:
        """Load a reference parameter-settings JSON verbatim (ref :303-311)."""
        with open(path) as f:
            self._params.update(json.load(f))
        return True

    def display_feature_types(self) -> list[str]:
        names = descriptor_names(self.seq_type)
        for n in names:
            print(n.split(":", 1)[1])
        return [n.split(":", 1)[1] for n in names]

    def get_descriptor(self, name: str, params: dict | None = None,
                       out_col: str = "features") -> DataFrame:
        key = f"{self.seq_type}:{name}"
        if name in ("PSTNPss", "PSTNPds"):
            from ifeatureomega_cli_spark.operators.crosssample import pstnp

            return pstnp(self.df, double_strand=(name == "PSTNPds"))
        if name == "KNN":
            from ifeatureomega_cli_spark.operators.crosssample import knn_features

            st = "protein" if self.seq_type == "protein" else "dna"
            return knn_features(self.df, st)
        cfg = {**self._params.get(name, {}), **(params or {})}
        return extract(self.df, key, cfg or None, out_col=out_col)

    def feature_names(self, name: str, params: dict | None = None,
                      length: int = 0) -> list[str]:
        cfg = {**self._params.get(name, {}), **(params or {})}
        if not length and get_spec(f"{self.seq_type}:{name}").equal_length:
            length = int(self.df.agg({"n_tok": "max"}).collect()[0][0])
        return feature_names(f"{self.seq_type}:{name}", cfg or None, length)

    # -- sinks ----------------------------------------------------------

    def to_csv(self, df: DataFrame, path: str, name: str | None = None) -> None:
        names = self.feature_names(name) if name else None
        sinks.write_csv(df.select("doc_id", "features"), path, names=names)

    def to_tsv(self, df: DataFrame, path: str, name: str | None = None) -> None:
        names = self.feature_names(name) if name else None
        sinks.write_tsv(df.select("doc_id", "features"), path, names=names)

    def to_svm(self, df: DataFrame, path: str) -> None:
        sinks.write_svm(df.select("label", "features"), path)

    def to_arff(self, df: DataFrame, path: str) -> None:
        sinks.write_arff(df.select("label", "features"), path)

    def to_pandas_matrix(self, df: DataFrame, name: str,
                         params: dict | None = None) -> pd.DataFrame:
        """Reference-shaped pandas frame: SampleName index, named columns."""
        pdf = df.select("doc_id", "features").toPandas()
        cols = self.feature_names(name, params)
        out = pd.DataFrame(pdf["features"].tolist(), columns=cols,
                           index=pdf["doc_id"])
        out.index.name = None
        return out


class ProteinDataset(SequenceDataset):
    seq_type = "protein"


class DNADataset(SequenceDataset):
    seq_type = "dna"


class RNADataset(SequenceDataset):
    seq_type = "rna"
