"""Forward/backward fill over entity time series (north_rule windowed ops).

ffill: carry the last non-null observation forward within each entity;
backfill: take the next non-null observation backward.  Single shuffle on
the entity key; frames never cross the current row in the leak-sensitive
(forward) direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ffill(
    df: DataFrame, cols: list[str], on: str = "doc_id", ts: str = "ts"
) -> DataFrame:
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def backfill(
    df: DataFrame, cols: list[str], on: str = "doc_id", ts: str = "ts"
) -> DataFrame:
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in cols:
        df = df.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return df
