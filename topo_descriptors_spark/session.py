"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench and spark-submit
jobs share one configuration: AQE on (runtime skew-join splitting and
partition coalescing), Arrow on (every Python-side kernel is an Arrow
batch, never per-row), explicit shuffle parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from topo_descriptors_spark.config import CFG


def get_spark(
    app_name: str = "topo-descriptors-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset).  On a real cluster, pass ``master=None`` and let
    spark-submit decide — every other setting below is cluster-safe.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = CFG.shuffle_partitions

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime coalescing of tiny shuffle partitions
        # and automatic skew-join splitting — both essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # All JVM<->Python traffic is Arrow-batched.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", CFG.max_partition_bytes)
        # Broadcast joins for small dims (kernel/stopword/marker tables).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in {**CFG.spark_extra, **(extra or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
