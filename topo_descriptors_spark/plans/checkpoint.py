"""Checkpointed, resumable partitioned runs with lineage + metrics.

The reference has no checkpointing (each scale is computed and written
sequentially, reference topo.py:53-59); the north rule requires it:
per-partition completion markers, resume by anti-joining work units
against the marker table, and lineage + counter metrics persisted next
to the output snapshots.

Layout under ``out_dir``::

    part=<unit>/...      one output partition per work unit (parquet)
    _markers/            completion markers (parquet; one row per unit:
                         unit, n_rows, wall_sec, finished_at, run_id)
    _lineage.json        inputs, params, engine version, run history

A unit is marked complete ONLY after its partition write finished, so a
crash mid-unit leaves no marker and the unit reruns from scratch into
the same path (overwrite) — idempotent at-least-once execution with
exactly-once visible results.

At warehouse scale the marker table is tiny (one row per coarse unit —
date buckets / entity ranges), so the resume anti-join broadcasts.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def _markers_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_markers")


def completed_units(spark: SparkSession, out_dir: str) -> set[str]:
    path = _markers_path(out_dir)
    try:
        return {
            r.unit for r in spark.read.parquet(path).select("unit").distinct().collect()
        }
    except Exception:
        return set()


def pending_units(
    spark: SparkSession, units: Sequence, out_dir: str
) -> list:
    """Anti-join of work units against the marker table (driver-side set
    difference here because the unit list is driver-resident; see
    :func:`pending_units_df` for the DataFrame form)."""
    done = completed_units(spark, out_dir)
    return [u for u in units if str(u) not in done]


def pending_units_df(units_df: DataFrame, out_dir: str) -> DataFrame:
    """DataFrame form: ``units_df`` (column ``unit``) anti-joined against
    the marker table — the scalable resume path when the unit list is a
    table itself."""
    spark = units_df.sparkSession
    try:
        markers = spark.read.parquet(_markers_path(out_dir)).select("unit")
    except Exception:
        return units_df
    return units_df.join(F.broadcast(markers), "unit", "left_anti")


def run_partitioned(
    spark: SparkSession,
    units: Sequence,
    unit_fn: Callable[[object], DataFrame],
    out_dir: str,
    run_id: str = "run",
    lineage: dict | None = None,
    on_unit_done: Callable[[str, int, float], None] | None = None,
) -> dict:
    """Execute ``unit_fn(unit)`` per pending work unit, writing each
    result to ``out_dir/part=<unit>`` with a completion marker.

    Already-marked units are skipped (resume).  Returns the run metrics
    dict (also persisted).  ``unit_fn`` must be deterministic per unit —
    reruns overwrite the partition.
    """
    os.makedirs(out_dir, exist_ok=True)
    todo = pending_units(spark, units, out_dir)
    skipped = len(units) - len(todo)
    metrics = {"run_id": run_id, "units_total": len(units),
               "units_skipped_resume": skipped, "units_run": 0, "rows": 0}
    t_run = time.monotonic()
    for unit in todo:
        t0 = time.monotonic()
        df = unit_fn(unit)
        part_path = os.path.join(out_dir, f"part={unit}")
        df.write.mode("overwrite").parquet(part_path)
        n_rows = spark.read.parquet(part_path).count()
        wall = time.monotonic() - t0
        marker = spark.createDataFrame(
            [
                Row(
                    unit=str(unit),
                    n_rows=n_rows,
                    wall_sec=float(round(wall, 3)),
                    finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    run_id=run_id,
                )
            ]
        )
        # marker append is the commit point for this unit
        marker.write.mode("append").parquet(_markers_path(out_dir))
        metrics["units_run"] += 1
        metrics["rows"] += n_rows
        if on_unit_done is not None:
            on_unit_done(str(unit), n_rows, wall)
    metrics["wall_sec"] = round(time.monotonic() - t_run, 3)

    lineage_path = os.path.join(out_dir, "_lineage.json")
    record = {
        "run_id": run_id,
        "engine": "topo_descriptors_spark",
        "lineage": lineage or {},
        "metrics": metrics,
    }
    history = []
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            history = json.load(f)
    history.append(record)
    with open(lineage_path, "w") as f:
        json.dump(history, f, indent=2, default=str)
    return metrics


def read_run(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the full output of a partitioned run."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "part=*")
    )
