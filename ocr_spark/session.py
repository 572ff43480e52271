"""SparkSession factory with the engine's standard configuration.

Local-mode knobs are sized for the sandbox (single JVM, 32 threads,
128 GiB) but every setting is the one you'd ship to a real cluster:
AQE on, Arrow on, UTC session timezone, shuffle partitions sized to
cores (not the 200 default).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    driver_memory: str = "16g",
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Build (or fetch) the configured session.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to 2x cores — enough slices for AQE to coalesce,
    few enough to avoid tiny-task overhead in local mode.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch caps bound per-batch memory for fat binary rows:
        # the record cap amortizes interchange for normal pages, and
        # the BYTE cap (Spark 4) cuts a batch early when multi-MB
        # payloads would balloon it — 2048 rows x 100 MB PDFs would
        # otherwise be gigabytes JVM-side before Python sees a byte.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "32m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    # Iceberg catalog as a config switch (SURVEY.md §4): the sandbox
    # has no iceberg-spark-runtime jar, so the pipeline runs on plain
    # parquet paths; on a cluster with the jar, pointing
    # SPARK_GRAFT_ICEBERG_WAREHOUSE at a warehouse turns on a hadoop
    # catalog named `ice` and the same code writes Iceberg tables
    # (partitionBy(bucket) becomes the table's bucket(url) spec).
    warehouse = os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE")
    if warehouse:
        builder = (
            builder.config(
                "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
            )
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config("spark.sql.catalog.ice.warehouse", warehouse)
        )

    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
