"""SparkSession factory.

One place to configure the engine for both test (local[N]) and cluster
posture. Every knob is chosen for the 100 TB target and merely *also*
works locally:

- AQE on: runtime coalescing, skew-join splitting, and dynamic
  broadcast conversion replace hand-tuned plans.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the static number mostly moot.
- UTC session timezone so timestamp arithmetic is reproducible and
  matches the DuckDB oracle (naive timestamps).
- Arrow enabled for the few pandas_udf paths (similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "olist_dw_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    In local mode there is a single JVM; on a cluster the same config
    applies unchanged — nothing here assumes local execution.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Single-JVM local mode: the driver heap IS the executor heap.
        # 32 task threads × shuffle/agg state needs real headroom; GC
        # thrash at 16g showed up as multi-second per-query variance.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Some producers write TIMESTAMP(NANOS) parquet (the driver's
        # events table does); Spark refuses it natively. Read as long
        # and convert at the reader boundary (sources.readers).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write tz timestamps as INT64 micros, not the deprecated INT96
        # default: INT96 columns carry NO parquet min/max statistics
        # (undefined sort order), which (a) forced the lake write path's
        # footer-stats read to fall back to a full stats-scan Spark job
        # on every timestamp-bearing table and (b) disabled min/max file
        # pruning on timestamp predicates. Values are identical on read.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
