"""Table IO: Iceberg when the runtime has it, parquet otherwise.

The production input is an Iceberg table of web pages (north rule /
input_hint). Iceberg support in Spark is a runtime concern — the
`iceberg-spark-runtime` jar plus a catalog config:

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hadoop | hive | rest
    spark.sql.catalog.lake.warehouse = s3://.../warehouse

This sandbox ships no Iceberg jar, so the engine is written against a
thin shim: table identifiers (`lake.db.pages`) route through the
Iceberg catalog when one is configured; bare paths fall back to
parquet with the same directory-per-snapshot layout the CheckpointStore
uses. Everything downstream (ingest, pregel, checkpoints) only sees
DataFrames, so swapping the storage layer touches nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True if an Iceberg SparkCatalog is on the classpath + configured."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    catalogs = [k for k, v in confs
                if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()]
    if not catalogs:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _is_table_ident(target: str) -> bool:
    return "/" not in target and not target.startswith(("s3:", "hdfs:", "file:"))


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read an Iceberg table identifier or a parquet path."""
    if _is_table_ident(target):
        return spark.read.table(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write to an Iceberg table identifier or a parquet path.

    Iceberg writes are snapshot-commits (atomic, time-travelable) —
    exactly what per-superstep checkpointing wants; the parquet
    fallback emulates atomicity with the CheckpointStore's commit
    marker instead.
    """
    if _is_table_ident(target):
        df.writeTo(target).using("iceberg").createOrReplace() if mode == "overwrite" \
            else df.writeTo(target).append()
        return
    df.write.mode(mode).parquet(target)
