"""Lag/lead feature operator over entity time series."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_lead(
    df: DataFrame,
    cols: list[str],
    offsets: list[int],
    on: str = "doc_id",
    ts: str = "ts",
) -> DataFrame:
    """Append ``{col}_lag{k}`` / ``{col}_lead{k}`` columns.

    Positive offsets are lags (past rows — leak-safe features), negative are
    leads (future rows — labels, never features).  One shuffle on `on`; all
    offsets share the same sorted window.
    """
    w = Window.partitionBy(on).orderBy(F.col(ts).asc())
    out = df
    for c in cols:
        for k in offsets:
            if k >= 0:
                out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            else:
                out = out.withColumn(f"{c}_lead{-k}", F.lead(c, -k).over(w))
    return out
