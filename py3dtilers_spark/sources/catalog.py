"""Table-format seam: the north rule's input is an ICEBERG table of
image+caption pairs; this sandbox has no Iceberg runtime jars, so the
engine reads/writes through this one seam instead of calling
spark.read.parquet all over.

- name "iceberg:<catalog.db.table>"  -> spark.read.format("iceberg"),
  with optional snapshot pinning (the option names are the public Iceberg
  Spark-source options: `snapshot-id` / `as-of-timestamp`). Available the
  moment the runtime has the Iceberg jars — no engine change needed.
- anything else -> a parquet directory (the sandbox stand-in; identical
  columnar scan properties: pushdown, pruning, split planning).

Writes mirror the same split. Everything downstream (tiler, queries,
lineage) is format-agnostic DataFrame code.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    name: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    if name.startswith("iceberg:"):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
        return reader.load(name[len("iceberg:"):])
    if snapshot_id is not None or as_of_timestamp_ms is not None:
        raise ValueError("snapshot pinning requires an iceberg: table")
    return spark.read.parquet(name)


def write_table(df: DataFrame, name: str, mode: str = "append") -> None:
    if name.startswith("iceberg:"):
        df.writeTo(name[len("iceberg:"):]).append() if mode == "append" else (
            df.writeTo(name[len("iceberg:"):]).createOrReplace()
        )
        return
    df.write.mode(mode).parquet(name)
