"""SparkSession factory tuned for this workload.

Local mode stands in for the cluster (driver instruction); the configs
that matter at 1000-executor scale are set here so the same code ships:
AQE for runtime re-planning and skew handling, Arrow for every pandas
UDF, small Arrow batches because rows carry multi-MB markdown/binary
payloads.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "paper2llm_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 3x task slots: stragglers overlap instead of serializing the
        # stage tail (one slow partition in a single-wave stage idles
        # every other core); AQE coalescing merges the excess when
        # partitions come out small
        shuffle_partitions = max(cpus * 3, 24)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # multi-MB markdown strings: keep Arrow batches small so a batch of
        # rows stays well under executor memory (SURVEY.md §7 hard point 4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
