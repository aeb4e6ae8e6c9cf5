"""Streaming point-in-time enrichment (north rule: zero temporal leakage
on a live stream).

The batch engine's as-of join (operators/asof.py) uses a running window —
not expressible on an unbounded stream (no window functions in Structured
Streaming).  The streaming-native equivalent reshapes the right side into
an SCD2 interval table ONCE in batch (`to_scd2`: each (key, value) version
carries [valid_from, valid_to)), then the stream enriches with a plain
stream-static range join — each event matches exactly the version that was
current at its event time, so semantics are identical to the batch as-of
join by construction, and the static side broadcasts when small.

At 100 TB: the dimension snapshot is versioned at write time (SCD2 is the
standard warehouse layout for exactly this reason); the stream-static join
re-reads the static side per micro-batch, so refresh = republish the
parquet.  For a FAST-changing right side, fall back to batch as-of over
micro-batch sinks instead — documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_scd2(
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """(key, ts, values...) change log → SCD2 intervals
    (key, valid_from, valid_to, values...) with valid_to = next change's ts
    (NULL = still current).  Equal-ts duplicates keep the LAST row of the
    batch as-of tie order (right side sorted by ts; the batch combinator's
    last-ignorenulls picks the final right row at equal ts)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    w = Window.partitionBy(on).orderBy(ts)
    # collapse equal-ts versions deterministically (last by value order)
    dedup = (right
             .withColumn("__rn", F.row_number().over(
                 Window.partitionBy(on, ts).orderBy(
                     *[F.col(c).desc() for c in value_cols])))
             .filter(F.col("__rn") == 1).drop("__rn"))
    return dedup.select(
        F.col(on), F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        *[F.col(c) for c in value_cols])


def streaming_asof_enrich(
    stream: DataFrame,
    scd2: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Enrich a stream with the dimension version current at each event's
    time: left stream-static join on
    ``key = key AND valid_from <= ts AND (ts < valid_to OR open)`` —
    exactly one match per event (intervals partition the timeline), NULLs
    where no version existed yet.  `tolerance_seconds` nulls matches whose
    version is older than the bound, mirroring the batch combinator."""
    s = stream
    if dict(s.dtypes).get(ts) == "timestamp_ntz":
        s = s.withColumn(ts, F.col(ts).cast("timestamp"))
    d = scd2
    for c in ("valid_from", "valid_to"):
        if dict(d.dtypes).get(c) == "timestamp_ntz":
            d = d.withColumn(c, F.col(c).cast("timestamp"))
    out = s.join(d.withColumnRenamed(on, f"__r_{on}"),
                 (s[on] == F.col(f"__r_{on}"))
                 & (F.col("valid_from") <= s[ts])
                 & (F.col("valid_to").isNull() | (s[ts] < F.col("valid_to"))),
                 "left").drop(f"__r_{on}", "valid_to")
    out = out.withColumnRenamed("valid_from", "matched_ts")
    if tolerance_seconds is not None:
        fresh = (F.col(ts).cast("double")
                 - F.col("matched_ts").cast("double")) <= tolerance_seconds
        vals = [c for c in out.columns
                if c not in stream.columns and c != "matched_ts"]
        for c in vals + ["matched_ts"]:
            out = out.withColumn(
                c, F.when(fresh, F.col(c)))
    return out
