"""SparkSession factory tuned for the local[32] harness.

The same settings are scale-appropriate defaults for a real cluster:
AQE on (runtime coalesce + skew-join splitting), UTC session timezone
(parquet timestamps compare bit-identically against the DuckDB
oracle), Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mnemo_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): byte-based
        # coalescing (parallelismFirst=false + a small advisory size)
        # was measured r9 to halve the co-purchase pair aggregation BUT
        # collapse the exchange feeding the applyInPandas chain fold to
        # 1-2 partitions — Python/Arrow stages look tiny in bytes while
        # being the most CPU-expensive stages in the suite
        # (assign_chain_events 1.4s -> 6.3s). Net bench -15%; reverted.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # events.parquet carries TIMESTAMP(NANOS); Spark 4 has no nanos
        # timestamp type — read as long, io.load_table converts to a
        # µs timestamp (truncation, matching DuckDB's µs internal type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("MNEMO_SPARK_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
