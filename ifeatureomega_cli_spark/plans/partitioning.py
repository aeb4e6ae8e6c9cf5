"""Partitioning / skew helpers (north_rule: explicit partitioning, salted
skew buckets, length-tiered repartition for heavy token rows).

At 100 TB these are the difference between a job that finishes and one that
stalls on two straggler tasks:

* ``bucket_by`` — stable hash bucket of the entity key; use as the write
  partition column so sort-merge as-of joins co-locate without re-shuffle;
* ``salt`` — spread one hot key over `n_salts` subkeys for aggregations
  that then need a second (tiny) merge pass;
* ``length_tiered_repartition`` — long token arrays (4096-token tail) go to
  their own partitions so Arrow batches stay bounded and task times even.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_by(df: DataFrame, key: str = "doc_id", n_buckets: int = 64,
              bucket_col: str = "bucket") -> DataFrame:
    """Deterministic hash bucket (xxhash64 — stable across sessions)."""
    return df.withColumn(
        bucket_col, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def salt(df: DataFrame, key: str, n_salts: int = 16,
         salt_col: str = "salt") -> DataFrame:
    """Per-row salt spreading a hot key over n_salts subkeys.

    The salt is derived from the FULL row content (xxhash64 over every
    column), so it is deterministic under task retry: a re-computed map
    task assigns each row the same salt, which keeps salted partial
    aggregations exactly-once under partial stage retry (a row-id-based
    salt would re-deal rows on recompute and double/under-count against
    surviving reducer outputs).  Identical rows land on the same salt —
    fine for aggregation (they belong to the same key anyway), and the
    spread over distinct rows is what kills the hot-key skew."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(n_salts)).cast("int"),
    )


def two_phase_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe count per key: salted partial counts then merge.

    The first shuffle spreads the hot key across n_salts reducers; the
    second shuffle only moves n_salts rows per key."""
    salted = salt(df, key, n_salts)
    partial = salted.groupBy(key, "salt").agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy(key).agg(F.sum("c").alias("count"))


def length_tiered_repartition(
    df: DataFrame,
    length_col: str = "n_tok",
    tiers: tuple[int, ...] = (128, 512, 2048),
    partitions_per_tier: int = 8,
) -> DataFrame:
    """Repartition so each output partition holds rows of one length tier.

    Long-token outliers stop dominating mixed partitions: Arrow batch bytes
    ≈ rows × tier ceiling instead of rows × max."""
    tier = F.lit(len(tiers))
    for i, t in enumerate(reversed(tiers)):
        tier = F.when(F.col(length_col) <= t, F.lit(len(tiers) - 1 - i)).otherwise(tier)
    tiered = df.withColumn("__tier", tier.cast("int"))
    return (
        tiered.repartition(
            partitions_per_tier * (len(tiers) + 1),
            F.col("__tier"),
            F.pmod(F.xxhash64(F.col(length_col).cast("string")), F.lit(partitions_per_tier)),
        )
        .drop("__tier")
    )
