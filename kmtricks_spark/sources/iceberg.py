"""Iceberg table adapter (north-rule input format) with parquet fallback.

The production deployment reads/writes Apache Iceberg (`spark.read
.format("iceberg")` / `df.writeTo(...).using("iceberg")`). This sandbox
container ships no Iceberg runtime jars, so the adapter probes for the
catalog once and degrades to plain parquet paths — the engine code is
identical either way, because everything downstream consumes DataFrames.

To enable on a real cluster, add to spark-submit:
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop
    --conf spark.sql.catalog.lake.warehouse=<warehouse-uri>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBED: dict[str, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    key = "ok"
    if key not in _PROBED:
        try:
            # Class.forName raises through py4j when the jar is absent;
            # attribute access alone (jvm.org.apache...) yields a lazy
            # JavaPackage and NEVER fails — probing that way reports
            # Iceberg present on every cluster
            spark._jvm.java.lang.Class.forName(  # noqa: SLF001
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _PROBED[key] = True
        except Exception:
            _PROBED[key] = False
    return _PROBED[key]


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """`ref` is an Iceberg table identifier (catalog.db.table) when the
    runtime is present, else a parquet path."""
    if iceberg_available(spark) and not ref.endswith(".parquet"):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, partition_by: list[str] | None = None) -> None:
    if iceberg_available(df.sparkSession) and not ref.endswith(".parquet"):
        w = df.writeTo(ref).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
