"""Versioned snapshots: append/overwrite visibility, time travel,
rollback, observed row counts, schema pinning."""

import tempfile

import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.sources import snapshots as S


@pytest.fixture()
def table_dir():
    with tempfile.TemporaryDirectory() as d:
        yield d + "/t"


def _batch(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") * 2.0).alias("v")
    )


def test_append_overwrite_time_travel(spark, table_dir):
    v1 = S.write_snapshot(_batch(spark, 10, "a"), table_dir, lineage={"step": 1})
    v2 = S.write_snapshot(_batch(spark, 5, "b"), table_dir, mode="append")
    assert (v1, v2) == (1, 2)
    assert S.read_snapshot(spark, table_dir).count() == 15
    assert S.read_snapshot(spark, table_dir, version=1).count() == 10

    v3 = S.write_snapshot(_batch(spark, 3, "c"), table_dir, mode="overwrite")
    cur = S.read_snapshot(spark, table_dir)
    assert cur.count() == 3
    assert {r.tag for r in cur.select("tag").distinct().collect()} == {"c"}
    # overwrite did not destroy history
    assert S.read_snapshot(spark, table_dir, version=v2).count() == 15

    S.rollback(table_dir, v2)
    assert S.current_version(table_dir) == v2
    assert S.read_snapshot(spark, table_dir).count() == 15
    # a write after rollback branches from v2's state
    S.write_snapshot(_batch(spark, 1, "d"), table_dir, mode="append")
    assert S.read_snapshot(spark, table_dir).count() == 16
    assert S.current_version(table_dir) == v3 + 1


def test_manifest_contents(spark, table_dir):
    S.write_snapshot(_batch(spark, 7, "a"), table_dir, lineage={"job": "j1"})
    S.write_snapshot(_batch(spark, 4, "b"), table_dir, mode="append")
    h = S.history(table_dir)
    assert [m["version"] for m in h] == [1, 2]
    assert h[0]["rows_written"] == 7 and h[0]["row_count"] == 7
    assert h[1]["rows_written"] == 4 and h[1]["row_count"] == 11
    assert h[0]["lineage"] == {"job": "j1"}
    assert h[1]["parent"] == 1 and h[1]["operation"] == "append"
    # schema is pinned in the manifest and used on read
    df = S.read_snapshot(spark, table_dir)
    assert [f.name for f in df.schema.fields] == ["id", "tag", "v"]


def test_rollback_unknown_version_raises(spark, table_dir):
    S.write_snapshot(_batch(spark, 1, "a"), table_dir)
    with pytest.raises(FileNotFoundError):
        S.rollback(table_dir, 99)


def test_commit_dirs_metadata_only(spark, table_dir):
    """The checkpoint-runner integration: publish already-written part
    dirs as one version without reading or moving data."""
    import os

    from topo_descriptors_spark.plans import checkpoint as C

    def fn(unit):
        return spark.range(20).select(
            F.col("id"), F.lit(unit).alias("unit_name")
        )

    C.run_partitioned(spark, ["u0", "u1"], fn, table_dir, run_id="r")
    v = S.commit_dirs(
        table_dir,
        ["part=u0", "part=u1"],
        fn("u0").schema,
        lineage={"run": "r"},
        row_count=40,
    )
    df = S.read_snapshot(spark, table_dir)
    assert df.count() == 40
    assert S.read_manifest(table_dir, v)["operation"] == "commit_dirs"
    with pytest.raises(FileNotFoundError):
        S.commit_dirs(table_dir, ["part=missing"], fn("u0").schema)


def test_orphan_data_dir_is_reclaimed(spark, table_dir):
    """A crash between the data write and the manifest publish leaves an
    orphan dir at the next version number; the retried write must
    reclaim it (no manifest ever referenced it)."""
    import os

    S.write_snapshot(_batch(spark, 5, "a"), table_dir)
    # simulate the crash: data for v2 exists, but no manifest / CURRENT
    orphan = os.path.join(table_dir, "data", "b00002")
    _batch(spark, 99, "junk").write.parquet(orphan)
    assert S.current_version(table_dir) == 1

    v = S.write_snapshot(_batch(spark, 7, "b"), table_dir, mode="append")
    assert v == 2
    assert S.read_snapshot(spark, table_dir).count() == 12  # junk reclaimed


def test_leftover_manifest_tmp_is_ignored(spark, table_dir):
    """A crash between the tmp write and os.replace leaves only a .tmp
    file — history()/read_manifest must be unaffected (the version slot
    is simply unpublished)."""
    import json
    import os

    S.write_snapshot(spark.range(3).toDF("id"), table_dir)
    # simulate a crashed writer for version 2
    tmp = os.path.join(table_dir, "_snapshots", "v00002.json.tmp")
    with open(tmp, "w") as f:
        f.write('{"version": 2, "corru')  # truncated mid-write
    assert [m["version"] for m in S.history(table_dir)] == [1]
    assert S.current_version(table_dir) == 1
    # the next writer reuses slot 2 cleanly
    v = S.write_snapshot(spark.range(2).toDF("id"), table_dir)
    assert v == 2
    assert json.loads(open(os.path.join(
        table_dir, "_snapshots", "v00002.json")).read())["version"] == 2


def test_iceberg_sink_interface(spark, tmp_path):
    """Pin the fmt='iceberg' interface so the io.py claim stays
    executable: in an environment with an Iceberg catalog this writes
    and reads back; in this sandbox (no catalog/runtime jar) it must
    SKIP, never silently pass or hard-fail."""
    import pytest as pt

    from topo_descriptors_spark.sources.io import write_table

    df = spark.range(10).withColumn("k", F.col("id") % 3)
    path = str(tmp_path / "t_iceberg")
    try:
        write_table(df, path, fmt="iceberg", cluster_by=["k"], n_files=2)
    except Exception as e:  # no catalog: DATA_SOURCE_NOT_FOUND or similar
        pt.skip(f"no Iceberg runtime in this environment: {str(e)[:100]}")
    back = spark.read.format("iceberg").load(path)
    assert back.count() == 10


def test_expire_snapshots_respects_shared_history(spark, table_dir):
    """Append chains share data dirs: expiring old versions must delete
    ONLY dirs no surviving manifest references, and never the CURRENT
    version even if it is old (post-rollback)."""
    import os

    S.write_snapshot(spark.range(4).toDF("id"), table_dir)             # v1
    S.write_snapshot(spark.range(3).toDF("id"), table_dir, mode="append")  # v2 refs v1's dir
    S.write_snapshot(spark.range(2).toDF("id"), table_dir, mode="overwrite")  # v3
    S.write_snapshot(spark.range(1).toDF("id"), table_dir, mode="overwrite")  # v4

    # dry run deletes nothing
    rep = S.expire_snapshots(table_dir, keep_last=2, dry_run=True)
    assert rep["expired_versions"] == [1, 2]
    assert [m["version"] for m in S.history(table_dir)] == [1, 2, 3, 4]

    rep = S.expire_snapshots(table_dir, keep_last=2)
    assert rep["expired_versions"] == [1, 2]
    assert [m["version"] for m in S.history(table_dir)] == [3, 4]
    # v1's dir was referenced only by expired manifests -> gone
    assert not os.path.isdir(os.path.join(table_dir, "data", "b00001"))
    # surviving versions still read
    assert S.read_snapshot(spark, table_dir).count() == 1
    assert S.read_snapshot(spark, table_dir, version=3).count() == 2


def test_expire_snapshots_keeps_current_after_rollback(spark, table_dir):
    import os

    S.write_snapshot(spark.range(5).toDF("id"), table_dir)                    # v1
    S.write_snapshot(spark.range(6).toDF("id"), table_dir, mode="overwrite")   # v2
    S.write_snapshot(spark.range(7).toDF("id"), table_dir, mode="overwrite")   # v3
    S.rollback(table_dir, 1)
    rep = S.expire_snapshots(table_dir, keep_last=1)
    # CURRENT (v1) survives alongside the newest (v3)
    assert 1 in rep["kept_versions"] and 3 in rep["kept_versions"]
    assert rep["expired_versions"] == [2]
    assert S.read_snapshot(spark, table_dir).count() == 5
    assert os.path.isdir(os.path.join(table_dir, "data", "b00001"))


def test_expire_snapshots_surfaces_failed_deletions(spark, table_dir, monkeypatch):
    """A data dir whose removal fails must land in failed_dirs, NOT be
    reported as removed (ADVICE r3) — it stays an orphan for the next
    expire/write to reclaim."""
    import os
    import shutil

    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    for _ in range(3):  # overwrite: each version owns its data dir
        S.write_snapshot(df, table_dir, mode="overwrite")

    real_rmtree = shutil.rmtree

    def flaky_rmtree(path, *a, **k):
        raise OSError("simulated concurrent access")

    monkeypatch.setattr(shutil, "rmtree", flaky_rmtree)
    rep = S.expire_snapshots(table_dir, keep_last=1)
    assert rep["expired_versions"] == [1, 2]
    assert rep["removed_dirs"] == []  # nothing verified gone
    assert len(rep["failed_dirs"]) >= 1  # the failure is SURFACED
    for d in rep["failed_dirs"]:
        assert os.path.exists(os.path.join(table_dir, d))

    # retry with working rmtree: the orphans are reclaimable -- expire
    # recomputes nothing (manifests already gone) but write_snapshot's
    # orphan reclaim or a manual sweep can now remove them; verify the
    # dirs CAN go and the report flips to removed
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    for d in rep["failed_dirs"]:
        real_rmtree(os.path.join(table_dir, d))
        assert not os.path.exists(os.path.join(table_dir, d))


def test_read_incremental_appends(spark, tmp_path):
    from topo_descriptors_spark.sources import snapshots as S

    t = str(tmp_path / "tbl")
    a = spark.createDataFrame([(1,), (2,)], "x long")
    b = spark.createDataFrame([(3,)], "x long")
    c = spark.createDataFrame([(4,), (5,)], "x long")
    v1 = S.write_snapshot(a, t)
    v2 = S.write_snapshot(b, t)
    v3 = S.write_snapshot(c, t)

    got = sorted(r["x"] for r in S.read_incremental(spark, t, v1).collect())
    assert got == [3, 4, 5]  # delta v1 -> CURRENT
    got = sorted(r["x"] for r in S.read_incremental(spark, t, v2, v3).collect())
    assert got == [4, 5]
    # equal versions -> empty, schema preserved
    empty = S.read_incremental(spark, t, v3, v3)
    assert empty.count() == 0 and empty.schema == a.schema


def test_read_incremental_rejects_non_append(spark, tmp_path):
    import pytest as _pt

    from topo_descriptors_spark.sources import snapshots as S

    t = str(tmp_path / "tbl2")
    v1 = S.write_snapshot(spark.createDataFrame([(1,)], "x long"), t)
    S.write_snapshot(
        spark.createDataFrame([(9,)], "x long"), t, mode="overwrite"
    )
    with _pt.raises(ValueError, match="append-only"):
        S.read_incremental(spark, t, v1)


def test_rewrite_data_files_compacts_appends(spark, tmp_path):
    """Ten tiny append versions -> one compacted version; history and
    time travel intact; row counts preserved."""
    from topo_descriptors_spark.sources.snapshots import (
        current_version,
        read_manifest,
        read_snapshot,
        rewrite_data_files,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    for i in range(10):
        df = spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "id * 2 as v"
        ).repartition(4)  # 4 small files per append
        write_snapshot(df, t, mode="append")
    v_before = current_version(t)
    report = rewrite_data_files(spark, t, target_file_bytes=1 << 30)
    assert report["files_before"] == 40
    assert report["files_after"] == 1  # everything fits one target file
    assert report["rows"] == 1000
    # compacted CURRENT reads identically
    back = read_snapshot(spark, t)
    assert back.count() == 1000
    assert back.agg({"v": "sum"}).collect()[0][0] == 2 * (999 * 1000 // 2)
    # time travel to the pre-compaction version still works
    old = read_snapshot(spark, t, version=v_before)
    assert old.count() == 1000
    m = read_manifest(t)
    assert m["lineage"]["operation"] == "rewrite_data_files"
    assert m["lineage"]["source_version"] == v_before


def test_rewrite_data_files_with_zorder(spark, tmp_path):
    from pyspark.sql import functions as F

    from topo_descriptors_spark.sources.snapshots import (
        read_snapshot,
        rewrite_data_files,
        write_snapshot,
    )

    t = str(tmp_path / "tblz")
    df = spark.range(5000).select(
        (F.col("id") / 100).cast("long").alias("x"),
        F.pmod(F.col("id"), F.lit(100)).alias("y"),
    )
    write_snapshot(df.repartition(8), t, mode="append")
    report = rewrite_data_files(
        spark, t, target_file_bytes=4096, zorder_by=["x", "y"]
    )
    assert report["files_after"] >= 2
    back = read_snapshot(spark, t)
    assert sorted(back.columns) == ["x", "y"]  # no helper-column leakage
    assert back.count() == 5000


def test_rewrite_data_files_after_commit_dirs_unknown_rowcount(spark, tmp_path):
    """ADVICE r4: a CURRENT version published via commit_dirs with
    row_count=None must compact cleanly — unknown source count is not a
    mismatch; the safety check falls back to a pre-rewrite count."""
    import os

    from topo_descriptors_spark.plans import checkpoint as C
    from topo_descriptors_spark.sources.snapshots import rewrite_data_files

    t = str(tmp_path / "t_none_rc")

    def fn(unit):
        return spark.range(25).select(
            F.col("id"), F.lit(unit).alias("unit_name")
        )

    C.run_partitioned(spark, ["u0", "u1"], fn, t, run_id="r")
    S.commit_dirs(t, ["part=u0", "part=u1"], fn("u0").schema)  # row_count=None
    assert S.read_manifest(t)["row_count"] is None
    report = rewrite_data_files(spark, t, target_file_bytes=1 << 30)
    assert report["rows"] == 50
    assert S.read_snapshot(spark, t).count() == 50
