"""Table source abstraction: the engine's operators are source-agnostic
(DataFrame in → DataFrame out); this shim resolves the input_hint's Iceberg
tables when the Iceberg runtime is on the classpath and falls back to
parquet paths otherwise (this sandbox ships no Iceberg jar).

On a real cluster:
    spark = get_spark(extra_conf={
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "rest", ...})
    df = load_table(spark, "iceberg:lake.db.sequences")
    # snapshot checkpointing: load_table(..., snapshot_id=...) →
    # `VERSION AS OF` time travel replaces the parquet-manifest lineage in
    # plans/checkpoint.py with Iceberg's own snapshot bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, uri: str,
               snapshot_id: int | None = None) -> DataFrame:
    """`iceberg:<catalog.db.table>` → Iceberg (optionally time-travel);
    anything else → parquet path."""
    if uri.startswith("iceberg:"):
        name = uri[len("iceberg:"):]
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.format("iceberg").load(name)
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    if uri.startswith("iceberg:"):
        w = df.writeTo(uri[len("iceberg:"):])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(uri)
