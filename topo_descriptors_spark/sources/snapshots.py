"""Versioned table snapshots over parquet — the engine's minimal,
honest stand-in for an Iceberg catalog (none exists in this sandbox).

What it reproduces from the table-format playbook:

* **Immutable data, append-only manifests.**  Every write lands in a
  fresh ``data/b<version>`` directory; a snapshot manifest (JSON) lists
  the EXACT data directories visible at that version plus schema,
  lineage, operation, and observed row counts.  Data files are never
  rewritten or deleted by a new version.
* **Atomic visibility.**  Readers resolve the current version through a
  single ``CURRENT`` pointer file updated by atomic rename — a write is
  either fully visible or not at all (the file-system analog of an
  Iceberg catalog swap; single-writer assumed, which the checkpoint
  runner's marker protocol already guarantees per table).
* **Time travel + rollback.**  ``read_snapshot(..., version=k)`` reads
  any historical version; ``rollback`` re-points CURRENT without
  touching data.

On a real cluster this module is replaced by ``df.writeTo(table)`` on an
Iceberg catalog — the call sites (checkpoint runner, run_job) only use
the narrow write/read/history interface, so the swap is mechanical.
north rule: "resumable from per-partition checkpoints with lineage and
counter metrics persisted alongside Iceberg snapshots".
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_snap_dir(table_dir), f"v{version:05d}.json")


def current_version(table_dir: str) -> int | None:
    """Version the CURRENT pointer resolves to (None for an empty table)."""
    path = os.path.join(_snap_dir(table_dir), "CURRENT")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshots in {table_dir}")
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _write_manifest(table_dir: str, version: int, manifest: dict) -> None:
    """Crash-safe manifest publish: write to a tmp path, then
    ``os.replace`` into place (same discipline as the CURRENT pointer) —
    a crash mid-write can never leave a corrupt v<NNNNN>.json that would
    permanently break ``history()``/``read_manifest`` for that version."""
    final = _manifest_path(table_dir, version)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    os.replace(tmp, final)


def _set_current(table_dir: str, version: int) -> None:
    """Atomic pointer swap: write-then-rename, the commit point."""
    cur = os.path.join(_snap_dir(table_dir), "CURRENT")
    tmp = cur + f".tmp.{version}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, cur)


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    lineage: dict | None = None,
) -> int:
    """Write ``df`` as a new table version; returns the version number.

    ``mode="append"`` makes the new version see the parent's data dirs
    plus the new one; ``"overwrite"`` sees only the new one (old data
    stays on disk for time travel).  Row count is captured with
    ``df.observe`` during the write — no re-read."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    parent = current_version(table_dir)
    # version numbers always advance past every EXISTING manifest, not
    # just past CURRENT — after a rollback, new writes branch from the
    # rolled-back state but never reuse a version (or its data dir)
    existing = [
        int(name[1:6])
        for name in os.listdir(_snap_dir(table_dir))
        if name.startswith("v") and name.endswith(".json")
    ]
    version = (max(existing) + 1) if existing else 1

    rel_dir = os.path.join("data", f"b{version:05d}")
    obs = Observation(f"snap_{os.path.basename(table_dir)}_{version}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    # overwrite, not errorifexists: a crash between data write and
    # manifest publish leaves an ORPHAN dir at this version number (no
    # manifest references it), and the retry must be able to reclaim it
    observed.write.mode("overwrite").parquet(os.path.join(table_dir, rel_dir))
    n_rows = int(obs.get["n"])

    dirs = [rel_dir]
    total = n_rows
    if mode == "append" and parent is not None:
        pm = read_manifest(table_dir, parent)
        dirs = pm["data_dirs"] + dirs
        total = pm["row_count"] + n_rows

    manifest = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "data_dirs": dirs,
        "rows_written": n_rows,
        "row_count": total,
        "schema": df.schema.jsonValue(),
        "lineage": lineage or {},
    }
    _write_manifest(table_dir, version, manifest)
    _set_current(table_dir, version)  # commit point
    return version


def commit_dirs(
    table_dir: str,
    data_dirs: list[str],
    schema: StructType,
    lineage: dict | None = None,
    row_count: int | None = None,
) -> int:
    """METADATA-ONLY commit: publish a new version whose data is a set of
    already-written parquet directories (paths relative to
    ``table_dir``).  No data is read, moved or rewritten — this is the
    Iceberg-style cheap commit the checkpoint runner uses to publish a
    completed partitioned run as one atomic table version."""
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    for d in data_dirs:
        if not os.path.isdir(os.path.join(table_dir, d)):
            raise FileNotFoundError(f"data dir {d!r} not found under {table_dir}")
    parent = current_version(table_dir)
    existing = [
        int(name[1:6])
        for name in os.listdir(_snap_dir(table_dir))
        if name.startswith("v") and name.endswith(".json")
    ]
    version = (max(existing) + 1) if existing else 1
    manifest = {
        "version": version,
        "parent": parent,
        "operation": "commit_dirs",
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "data_dirs": list(data_dirs),
        "rows_written": row_count,
        "row_count": row_count,
        "schema": schema.jsonValue(),
        "lineage": lineage or {},
    }
    _write_manifest(table_dir, version, manifest)
    _set_current(table_dir, version)
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at a version (default: CURRENT) — time travel."""
    m = read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, d) for d in m["data_dirs"]]
    return spark.read.schema(
        StructType.fromJson(m["schema"])
    ).parquet(*paths)


def history(table_dir: str) -> list[dict]:
    """All snapshot manifests, oldest first."""
    d = _snap_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def rollback(table_dir: str, version: int) -> None:
    """Re-point CURRENT at an existing version (data untouched)."""
    if not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(f"no snapshot v{version} in {table_dir}")
    _set_current(table_dir, version)


def expire_snapshots(
    table_dir: str, keep_last: int = 2, dry_run: bool = False
) -> dict:
    """Iceberg-style snapshot expiration: drop all but the newest
    ``keep_last`` manifests (the CURRENT version is always kept, even
    after a rollback to an old version), then delete data directories
    no surviving manifest references.

    Safe by construction: the reachable-set is computed from the
    SURVIVING manifests (append manifests carry their full data-dir
    list, so history sharing is respected), deletion order is
    manifests-first (a crash mid-expire leaves unreferenced data dirs —
    exactly the orphan state ``write_snapshot`` already reclaims), and
    the CURRENT pointer is never touched.  ``dry_run`` reports what
    would go without deleting.

    Returns {"expired_versions": [...], "removed_dirs": [...],
    "kept_versions": [...], "failed_dirs": [...]} — ``removed_dirs``
    reports only directories VERIFIED gone after deletion; a dir whose
    removal failed (permissions, concurrent writer) lands in
    ``failed_dirs`` instead of being silently reported as removed (it
    stays an orphan that the next ``write_snapshot`` / ``expire`` can
    reclaim).
    """
    import shutil

    versions = sorted(m["version"] for m in history(table_dir))
    if not versions:
        return {"expired_versions": [], "removed_dirs": [], "kept_versions": []}
    cur = current_version(table_dir)
    keep = set(versions[-max(int(keep_last), 1):])
    if cur is not None:
        keep.add(cur)
    expired = [v for v in versions if v not in keep]
    reachable: set[str] = set()
    for v in keep:
        reachable.update(read_manifest(table_dir, v)["data_dirs"])
    doomed_dirs = sorted(
        {
            d
            for v in expired
            for d in read_manifest(table_dir, v)["data_dirs"]
        }
        - reachable
    )
    removed: list[str] = []
    failed: list[str] = []
    if not dry_run:
        for v in expired:  # manifests first: crash leaves only orphans
            os.remove(_manifest_path(table_dir, v))
        for d in doomed_dirs:
            p = os.path.join(table_dir, d)
            try:
                shutil.rmtree(p)
            except OSError:
                pass
            # re-check existence: report as removed only what is GONE
            (failed if os.path.exists(p) else removed).append(d)
    else:
        removed = doomed_dirs
    return {
        "expired_versions": expired,
        "removed_dirs": removed,
        "kept_versions": sorted(keep),
        "failed_dirs": failed,
    }


def read_incremental(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC-style incremental read: ONLY the rows appended between
    ``from_version`` (exclusive) and ``to_version`` (inclusive,
    default CURRENT) — the consumer pattern for downstream jobs that
    process a table's delta instead of re-scanning it.

    The delta is computed manifest-side as the data dirs present at
    ``to_version`` but not at ``from_version`` — a metadata-only diff,
    no data listing.  Raises when the interval is not append-only (an
    overwrite or a rollback branch between the versions: the delta is
    then not expressible as added files — the caller must full-rescan),
    detected as ``from``'s dirs not being a subset of ``to``'s.  Equal
    versions return an empty DataFrame with the table schema.
    """
    mt = read_manifest(table_dir, to_version)
    mf = read_manifest(table_dir, from_version)
    old, new = set(mf["data_dirs"]), list(mt["data_dirs"])
    if not old.issubset(set(new)):
        raise ValueError(
            f"read_incremental: v{mf['version']}..v{mt['version']} is not "
            "an append-only delta (overwrite or rollback branch in "
            "between); re-read the full snapshot instead"
        )
    delta = [d for d in new if d not in old]
    schema = StructType.fromJson(mt["schema"])
    if not delta:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, d) for d in delta]
    )


def rewrite_data_files(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the ``rewrite_data_files`` maintenance
    action of the table-format playbook.  An append-heavy table (one
    data dir per checkpointed unit / streaming micro-batch) accumulates
    thousands of small files; every read then pays per-file open +
    footer costs and the scheduler per-file task overhead.  This
    rewrites CURRENT into ``ceil(total_bytes / target_file_bytes)``
    right-sized files as a NEW version — prior versions keep the old
    layout for time travel, and ``expire_snapshots`` reclaims it later.

    ``cluster_by`` / ``zorder_by`` re-sort during the rewrite (the
    natural moment to establish a clustered layout — compaction is the
    only time the whole table rewrites anyway).

    Safety: the compacted version's observed row count must equal the
    source's manifest count; on mismatch CURRENT is rolled back to the
    source version and the compaction raises — a bad rewrite can never
    become the visible table state.
    """
    m = read_manifest(table_dir)
    src_files, src_bytes = [], 0
    for rel in m["data_dirs"]:
        d = os.path.join(table_dir, rel)
        for name in os.listdir(d):
            if name.endswith(".parquet"):
                p = os.path.join(d, name)
                src_files.append(p)
                src_bytes += os.path.getsize(p)
    n_files = max(1, -(-src_bytes // int(target_file_bytes)))
    df = read_snapshot(spark, table_dir)
    # needed only when the source manifest has row_count=None (see the
    # safety check below); counted on the SOURCE version's files
    df_rows = df.count() if m["row_count"] is None else None
    if zorder_by or cluster_by:
        from topo_descriptors_spark.sources.io import zorder_col

        if zorder_by and cluster_by:
            raise ValueError("cluster_by and zorder_by are mutually exclusive")
        if zorder_by:
            d2, z = zorder_col(df, zorder_by)
            df = (
                d2.withColumn("_zval", z)
                .repartitionByRange(n_files, F.col("_zval"))
                .sortWithinPartitions("_zval")
                .drop("_zval", *[f"_zmin_{c}" for c in zorder_by],
                      *[f"_zmax_{c}" for c in zorder_by])
            )
        else:
            cols = [F.col(c) for c in cluster_by]
            df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_files)
    version = write_snapshot(
        df, table_dir, mode="overwrite",
        lineage={
            "operation": "rewrite_data_files",
            "source_version": m["version"],
            "files_before": len(src_files),
            "bytes_before": src_bytes,
            "target_file_bytes": int(target_file_bytes),
        },
    )
    new = read_manifest(table_dir, version)
    # versions published via commit_dirs may carry row_count=None — an
    # unknown source count is not a mismatch; fall back to the count
    # observed on the read we just compacted from
    src_rows = m["row_count"]
    if src_rows is None:
        src_rows = df_rows
    if src_rows is not None and new["row_count"] != src_rows:
        rollback(table_dir, m["version"])
        raise RuntimeError(
            f"rewrite_data_files: row count changed during compaction "
            f"({src_rows} -> {new['row_count']}); CURRENT rolled "
            f"back to v{m['version']}"
        )
    out_dir = os.path.join(table_dir, new["data_dirs"][-1])
    files_after = len(
        [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    )
    return {
        "version": version,
        "files_before": len(src_files),
        "files_after": files_after,
        "bytes_before": src_bytes,
        "rows": new["row_count"],
    }
