"""Distributed FASTA ingest → tokenized table (ref iFeatureOmegaCLI.py:72-95).

The reference reads the whole file into one string and splits on '>'.  The
Spark ingest must be distributed, so we read line-wise, tag each line with
its record id via a running count of headers (one window pass), then group
— a classic multi-line-record ingest that scales to any file count.

Header grammar ``>name|label|purpose`` (fields 2 and 3 optional, defaulting
to '0'/'training', ref :90-92).  Character masking replicates :88 (protein
read-time rewrite of anything outside [ACDEFGHIKLMNPQRSTUVWY-] to '-') and
:135 / :141 (type-dependent rewrites) at tokenize time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ifeatureomega_cli_spark.tokenize import (
    DNA_NT, PROTEIN_AA, tokenize_dna, tokenize_protein)


def read_fasta(spark: SparkSession, path: str, seq_type: str = "auto") -> DataFrame:
    """FASTA file(s) → (doc_id, tokens array<int>, n_tok, source, label,
    purpose).

    NOTE: record assembly uses a single ordered window over the file's
    line index — fine for ingest-sized files; for TB-scale ingest feed many
    files (one task each) rather than one giant file.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("lineno"),
            F.input_file_name().alias("file"),
            F.col("value"),
        )
        .filter(F.trim("value") != "")
    )
    w = Window.partitionBy("file").orderBy("lineno")
    tagged = lines.withColumn(
        "rec", F.sum(F.when(F.col("value").startswith(">"), 1).otherwise(0)).over(w)
    )
    recs = (
        tagged.groupBy("file", "rec")
        .agg(
            F.min(F.when(F.col("value").startswith(">"), F.col("value"))).alias("header"),
            F.concat_ws(
                "", F.collect_list(F.when(~F.col("value").startswith(">"), F.col("value")))
            ).alias("seq"),
        )
        .filter(F.col("header").isNotNull())
    )
    parts = F.split(F.regexp_replace(F.col("header"), "^>", ""), "\\|")
    # F.get returns null out-of-bounds (ANSI-safe); [] would raise
    parsed = recs.select(
        F.get(F.split(F.get(parts, 0), "\\s+"), 0).alias("doc_id"),
        F.coalesce(F.get(parts, 1), F.lit("0")).alias("label"),
        F.coalesce(F.get(parts, 2), F.lit("training")).alias("purpose"),
        F.upper(F.col("seq")).alias("seq"),
        F.col("file").alias("source"),
    )
    if seq_type == "auto":
        seq_type = sniff_type(parsed)
    return tokenize_table(parsed, seq_type)


def sniff_type(parsed: DataFrame, sample: int = 100) -> str:
    """Alphabet sniffer (ref :115-144): ≤100 sampled sequences; alphabet
    size ≤5 with T → DNA, with U → RNA, 6..21 → protein."""
    rows = parsed.select("seq").limit(sample).collect()
    chars = set("".join(r["seq"] for r in rows))
    if 0 < len(chars) <= 5 and "T" in chars:
        return "dna"
    if 0 < len(chars) <= 5 and "U" in chars:
        return "rna"
    if 5 < len(chars) <= 21:
        return "protein"
    return "unknown"


def tokenize_table(parsed: DataFrame, seq_type: str) -> DataFrame:
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    tok = tokenize_protein if seq_type == "protein" else tokenize_dna

    @pandas_udf(ArrayType(IntegerType()))
    def _tok(seqs: pd.Series) -> pd.Series:
        return pd.Series([tok(s).tolist() for s in seqs])

    return parsed.select(
        "doc_id",
        _tok(F.col("seq")).alias("tokens"),
        F.length("seq").cast("int").alias("n_tok"),
        "source", "label", "purpose",
    )


def length_stats(df: DataFrame, n_tok_col: str = "n_tok",
                 tokens_col: str = "tokens", gap_id: int = 20):
    """Equal-length gate + min/max with and without gaps (ref :97-113)."""
    no_gap = F.size(F.filter(F.col(tokens_col), lambda t: t != gap_id))
    row = df.agg(
        F.countDistinct(n_tok_col).alias("n_lengths"),
        F.min(n_tok_col).alias("min_len"),
        F.max(n_tok_col).alias("max_len"),
        F.min(no_gap).alias("min_len_no_gap"),
        F.max(no_gap).alias("max_len_no_gap"),
    ).collect()[0]
    return {
        "is_equal": row["n_lengths"] == 1,
        "minimum_length": row["min_len"],
        "maximum_length": row["max_len"],
        "minimum_length_without_minus": row["min_len_no_gap"],
        "maximum_length_without_minus": row["max_len_no_gap"],
    }


def attach_labels(df: DataFrame, labels: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Label attach by doc_id join (the reference's positional label file,
    ref :408-412, becomes an id join — positional order is meaningless on a
    distributed table)."""
    return df.drop("label").join(
        F.broadcast(labels.select(id_col, "label")), id_col, "left"
    ).fillna({"label": "0"})
