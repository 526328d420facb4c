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
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable by Python WORKERS, not just the driver.

    Arrow kernel closures (tiles, packed, multimodal, streaming state)
    reference package modules, and cloudpickle serializes module-level
    functions BY REFERENCE — a worker that cannot ``import
    topo_descriptors_spark`` fails mid-task with ModuleNotFoundError.
    On a real cluster ``spark-submit --py-files`` ships the package (the
    deployment shape this engine documents); this covers every other
    entry point — a driver that merely put the repo on ``sys.path``
    (tests, notebooks, scripts run from another cwd) — by zipping the
    installed package once and ``addPyFile``-ing it, which distributes
    to workers in ANY master mode.  No-op when already shipped, when
    spark-submit --py-files already distributed the package, or when
    the package is on the workers' import path anyway.  The zip is
    cached under a stable temp path keyed by a content fingerprint
    (max mtime + total size of the package's .py files), so repeated
    sessions reuse it and an edited package rebuilds it (ADVICE r6:
    the old mkdtemp-per-session left one orphan dir per SparkSession).
    """
    sc = spark.sparkContext
    if getattr(sc, "_tds_pkg_shipped", False):
        return
    import shutil
    import tempfile

    if "topo_descriptors_spark" in sc.getConf().get(
            "spark.submit.pyFiles", ""):
        sc._tds_pkg_shipped = True
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip/egg: under spark-submit --py-files the
        # archive is already on every worker's path; when the driver
        # merely put the zip on sys.path itself, ship that same zip
        arch = pkg_dir
        while arch and not os.path.isfile(arch):
            arch = os.path.dirname(arch)
        if arch and arch not in sc.getConf().get("spark.submit.pyFiles", ""):
            sc.addPyFile(arch)
        sc._tds_pkg_shipped = True
        return
    # content fingerprint: cheap stat walk, no file reads — enough to
    # invalidate the cache whenever any package .py changes
    mt, sz = 0.0, 0
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                st = os.stat(os.path.join(root, f))
                mt = max(mt, st.st_mtime)
                sz += st.st_size
    tag = f"{int(mt)}_{sz}"
    cache = os.path.join(tempfile.gettempdir(), "tds_pyfiles_cache")
    zip_path = os.path.join(cache, f"topo_descriptors_spark_{tag}.zip")
    if not os.path.isfile(zip_path):
        os.makedirs(cache, exist_ok=True)
        for old in os.listdir(cache):  # stale fingerprints
            if old.startswith("topo_descriptors_spark_"):
                os.unlink(os.path.join(cache, old))
        # zip with the package as the archive root so workers import it
        # flat; build under a pid-unique name then rename atomically so
        # concurrent sessions never addPyFile a half-written zip
        tmp = shutil.make_archive(
            os.path.join(cache, f"_build_{os.getpid()}"), "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir),
        )
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    sc._tds_pkg_shipped = True
