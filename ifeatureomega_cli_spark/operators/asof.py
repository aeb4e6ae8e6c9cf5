"""Point-in-time (as-of) join — a pure DataFrame combinator.

The reference has no as-of join (SURVEY.md §2.9); this operator comes from
the engine's north rule: match each left row (entity, ts) with the latest
right row of the same entity having ``right.ts <= left.ts`` — zero temporal
leakage by construction.

Strategy (union + last-ignorenulls over a running window):

    union(left ∪ right) → Window.partitionBy(key).orderBy(ts, side)
    F.last(right_payload, ignorenulls=True).rowsBetween(-inf, 0)

One shuffle on the entity key, sorted by ts — the same work a sort-merge
as-of join would do, expressed with public API only so AQE still handles
skewed entities.  Rows at equal ts order the right side first (side flag in
the sort key), giving inclusive `<=` semantics identical to DuckDB/pandas
``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "doc_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the most recent right row (right.ts <= left.ts).

    Returns the left columns plus ``matched_ts`` and each right value column
    (optionally suffixed).  Left rows with no prior right row keep nulls.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]

    payload = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)

    m = F.col("__m")
    if tolerance_seconds is not None:
        within = m.isNotNull() & (
            F.col(ts).cast("timestamp").cast("double")
            - m["__rts"].cast("timestamp").cast("double") <= float(tolerance_seconds)
        )
        m = F.when(within, F.col("__m"))

    sel = [F.col(c) for c in left_cols if c in left_cols]
    sel.append(m["__rts"].alias("matched_ts"))
    for c in value_cols:
        sel.append(m[c].alias(c + suffix))
    return out.select(*sel)
