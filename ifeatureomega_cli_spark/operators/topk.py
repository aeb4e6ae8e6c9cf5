"""Top-k per group — rank inside a group window, keep k rows.

At scale this is one shuffle on the group key; Spark's window TopK
optimization (rank predicate pushed into the sort) keeps it from
materializing full groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_breakers: list[str] | None = None,
    rank_col: str = "rk",
) -> DataFrame:
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ] + [F.col(c).asc() for c in (tie_breakers or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
