"""Hive-style bucketed tables — shuffle-free co-located joins.

`plans.partitioning.bucket_by` adds an explicit bucket COLUMN (useful as
a write-partition key for as-of co-location); this module goes further
and uses Spark's native bucketed-table support: `bucketBy(n, key)` +
`saveAsTable` records the bucket spec in the catalog, and every later
equi-join or aggregation on that key reads each bucket as one partition
and skips its Exchange entirely.

The 100 TB story: a corpus that is joined/aggregated on the same key
repeatedly (doc_id enrichments, per-user feature builds, dedup-keeper
applications) pays ONE bucketed write, then every downstream sort-merge
join on that key is Exchange-free on both sides — the shuffle that would
otherwise dominate each job is amortized into the ingest.  Both tables
must share the bucket count (or be integer multiples with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).

Plan-pinned by tests/test_plan_invariants.py::test_bucketed_join_no_exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    path: str | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed (and optionally sorted)
    on `key`.

    `path` makes it an external table (data at the given location);
    without it the session's warehouse dir is used.  `sort_by` additionally
    sorts within buckets (cheapens the join's residual LOCAL per-bucket
    Sort; Spark only elides that Sort entirely behind its legacy
    bucketed-scan-ordering flag — the eliminated Exchange is the network
    cost that matters)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with `write_bucketed` on their
    bucket key: with matching bucket counts Catalyst plans a sort-merge
    join with ZERO Exchange on either side (local per-bucket Sorts
    remain — in-memory, no network)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
