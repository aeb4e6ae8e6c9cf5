"""Time-range rolling aggregates and time-bucket rollups over entity
streams — the 'hypertable' style windowed feature operators.

rolling_agg: per row, aggregates over the trailing `window_seconds` of the
same entity (RANGE frame on event time — leak-safe: the frame never looks
forward).  One shuffle on the entity key.

time_bucket_rollup: one row per (entity, bucket) — the classic
continuous-aggregate materialization; a plain groupBy (partial-aggregated
map-side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_agg(
    df: DataFrame,
    value: str,
    window_seconds: float,
    on: str = "doc_id",
    ts: str = "ts",
    aggs: tuple[str, ...] = ("mean", "sum", "count", "min", "max"),
) -> DataFrame:
    # RANGE frames need integral boundaries: order by epoch microseconds
    ep = (F.col(ts).cast("timestamp").cast("double") * 1_000_000).cast("long")
    w = (
        Window.partitionBy(on)
        .orderBy(ep)
        .rangeBetween(-int(window_seconds * 1_000_000), 0)
    )
    out = df
    fns = {"mean": F.avg, "sum": F.sum, "count": lambda c: F.count(F.lit(1)),
           "min": F.min, "max": F.max}
    for a in aggs:
        out = out.withColumn(f"{value}_roll_{a}", fns[a](value).over(w))
    return out


def time_bucket_rollup(
    df: DataFrame,
    value: str,
    bucket: str = "1 hour",
    on: str = "doc_id",
    ts: str = "ts",
) -> DataFrame:
    tcol = F.col(ts).cast("timestamp")
    return (
        df.groupBy(F.col(on), F.window(tcol, bucket).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
            F.avg(value).alias("avg_value"),
        )
        .select(
            on,
            F.col("w.start").alias("bucket_start"),
            "n_events", "sum_value", "avg_value",
        )
    )
