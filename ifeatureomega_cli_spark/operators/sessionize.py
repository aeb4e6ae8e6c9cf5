"""Sessionization of entity event streams by inactivity gap.

Batch path: gap-start flags + running sum over a per-entity window (one
shuffle).  Streaming path: `F.session_window` with a watermark (see
streaming/sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: float,
    on: str = "doc_id",
    ts: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Append an integer per-entity session index (0-based) and a global
    ``session_col`` string key ``{entity}#{index}``."""
    w = Window.partitionBy(on).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    # cast via TIMESTAMP → double epoch; works for both NTZ and LTZ inputs
    # (gap is a difference, so the session-timezone offset cancels)
    ep = lambda c: c.cast("timestamp").cast("double")
    new_sess = F.when(
        prev.isNull() | (ep(F.col(ts)) - ep(prev) > float(gap_seconds)),
        1,
    ).otherwise(0)
    run = Window.partitionBy(on).orderBy(F.col(ts).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    df = df.withColumn("__new", new_sess)
    df = df.withColumn("session_index", F.sum("__new").over(run) - F.lit(1))
    return df.drop("__new").withColumn(
        session_col, F.concat_ws("#", F.col(on).cast("string"), F.col("session_index"))
    )


def session_stats(
    df: DataFrame,
    gap_seconds: float,
    on: str = "doc_id",
    ts: str = "ts",
    value: str | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per session (start/end/n_events)."""
    s = sessionize(df, gap_seconds, on, ts)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value is not None:
        aggs.append(F.sum(value).alias("sum_value"))
    return s.groupBy(on, "session_index").agg(*aggs)
