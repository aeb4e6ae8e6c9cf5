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
         salt_col: str = "salt", id_cols: list[str] | None = None) -> DataFrame:
    """Per-row salt spreading a hot key over n_salts subkeys —
    DETERMINISTIC under task retry (a row-position-based salt would
    re-deal rows on recompute and double/under-count against surviving
    reducer outputs of the first attempt).

    Pass `id_cols` (any columns forming a unique row identity, e.g. the
    event id) for the strongest spread: unique ids hash uniformly no
    matter how duplicated the payload is.  Without it the salt falls back
    to xxhash64 over ALL columns — still retry-safe, but identical rows
    collapse onto one salt, so a heavily-duplicated hot key (or a frame
    projected down to just the key) is NOT spread; prefer id_cols whenever
    a unique column exists."""
    cols = id_cols if id_cols else list(df.columns)
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
               F.lit(n_salts)).cast("int"),
    )


def two_phase_count(df: DataFrame, key: str, n_salts: int = 16,
                    id_cols: list[str] | None = None) -> DataFrame:
    """Skew-safe count per key: salted partial counts then merge.

    The first shuffle spreads the hot key across n_salts reducers; the
    second shuffle only moves n_salts rows per key.  Pass id_cols (a
    unique row identity) when rows can be duplicates of each other — see
    salt()."""
    salted = salt(df, key, n_salts, id_cols=id_cols)
    partial = salted.groupBy(key, "salt").agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy(key).agg(F.sum("c").alias("count"))


def length_tiered_repartition(
    df: DataFrame,
    length_col: str = "n_tok",
    tiers: tuple[int, ...] = (128, 512, 2048),
    partitions_per_tier: int = 8,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition so each output partition holds rows of one length tier.

    Long-token outliers stop dominating mixed partitions: Arrow batch bytes
    ≈ rows × tier ceiling instead of rows × max.

    The intra-tier spread key hashes `id_cols` (default: ALL columns), NOT
    the length itself — hashing the length sends every row of one length to
    ONE partition, so an equal-length corpus (every A2/A3 positional
    descriptor input, e.g. all peptides length 31) would collapse to a
    single task and the 8192-token tail would land on one straggler.  Pass
    `id_cols` (a unique row identity, e.g. the doc id) for the strongest
    spread; the all-columns fallback still collapses rows that are full
    duplicates of each other — dedup those first."""
    tier = F.lit(len(tiers))
    for i, t in enumerate(reversed(tiers)):
        tier = F.when(F.col(length_col) <= t, F.lit(len(tiers) - 1 - i)).otherwise(tier)
    tiered = df.withColumn("__tier", tier.cast("int"))
    spread_cols = id_cols if id_cols else list(df.columns)
    return (
        tiered.repartition(
            partitions_per_tier * (len(tiers) + 1),
            F.col("__tier"),
            F.pmod(F.xxhash64(*[F.col(c) for c in spread_cols]),
                   F.lit(partitions_per_tier)),
        )
        .drop("__tier")
    )
