"""Resume semantics: crash after k units -> restart recomputes only the
pending units and the final table equals a clean run (SURVEY.md §5.5)."""

import tempfile

import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.plans import checkpoint as C


@pytest.fixture()
def out_dir():
    with tempfile.TemporaryDirectory() as d:
        yield d + "/run"


UNITS = ["u0", "u1", "u2", "u3"]


def _make_unit_fn(spark, calls):
    def unit_fn(unit):
        calls.append(unit)
        base = spark.range(100).select(
            F.col("id"),
            F.lit(unit).alias("unit_name"),
            (F.col("id") * 2).alias("feature"),
        )
        return base

    return unit_fn


class Boom(Exception):
    pass


def test_resume_skips_completed(spark, out_dir):
    calls: list[str] = []
    fn = _make_unit_fn(spark, calls)

    # first run crashes after 2 completed units
    def crashing(unit):
        if len(calls) == 2:
            raise Boom()
        return fn(unit)

    with pytest.raises(Boom):
        C.run_partitioned(
            spark, UNITS, crashing, out_dir, run_id="r1", max_parallel_units=1
        )
    assert calls == ["u0", "u1"]
    assert C.completed_units(spark, out_dir) == {"u0", "u1"}

    # restart: only pending units run
    calls.clear()
    metrics = C.run_partitioned(
        spark, UNITS, fn, out_dir, run_id="r2", max_parallel_units=1
    )
    assert calls == ["u2", "u3"]
    assert metrics["units_skipped_resume"] == 2
    assert metrics["units_run"] == 2

    # final table identical to a clean run
    got = C.read_run(spark, out_dir)
    assert got.count() == 400
    assert got.select("unit_name").distinct().count() == 4
    s = got.agg(F.sum("feature")).first()[0]
    assert s == 4 * sum(2 * i for i in range(100))


def test_pending_units_df(spark, out_dir):
    calls: list[str] = []
    C.run_partitioned(spark, UNITS[:2], _make_unit_fn(spark, calls), out_dir)
    units_df = spark.createDataFrame([(u,) for u in UNITS], ["unit"])
    pending = C.pending_units_df(units_df, out_dir)
    assert {r.unit for r in pending.collect()} == {"u2", "u3"}
    # the resume anti-join must broadcast the marker table
    plan = pending._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_rerun_is_noop(spark, out_dir):
    calls: list[str] = []
    fn = _make_unit_fn(spark, calls)
    C.run_partitioned(spark, UNITS, fn, out_dir, run_id="a")
    calls.clear()
    m = C.run_partitioned(spark, UNITS, fn, out_dir, run_id="b")
    assert calls == []
    assert m["units_run"] == 0 and m["units_skipped_resume"] == 4


def test_observed_row_counts_in_markers(spark, out_dir):
    """n_rows must come from df.observe during the write (no output
    re-read) and land correctly in both metrics and the marker table."""
    def fn(unit):
        n = {"u0": 7, "u1": 31}[unit]
        return spark.range(n).select(F.col("id"), F.lit(unit).alias("unit_name"))

    m = C.run_partitioned(spark, ["u0", "u1"], fn, out_dir, run_id="obs")
    assert m["rows"] == 38
    markers = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir + "/_markers")
        .toPandas()
        .set_index("unit")
    )
    assert int(markers.loc["u0", "n_rows"]) == 7
    assert int(markers.loc["u1", "n_rows"]) == 31


def test_concurrent_units_complete_and_resume(spark, out_dir):
    """Concurrent submission: one unit fails, the others still commit;
    resume reruns only the failed unit."""
    import threading

    seen = set()
    seen_lock = threading.Lock()

    def fn(unit):
        with seen_lock:
            seen.add(unit)
        if unit == "u2":
            raise Boom()
        return spark.range(50).select(F.col("id"), F.lit(unit).alias("unit_name"))

    with pytest.raises(Boom):
        C.run_partitioned(
            spark, UNITS, fn, out_dir, run_id="c1", max_parallel_units=4
        )
    assert seen == set(UNITS)
    assert C.completed_units(spark, out_dir) == {"u0", "u1", "u3"}

    def fn_ok(unit):
        return spark.range(50).select(F.col("id"), F.lit(unit).alias("unit_name"))

    m = C.run_partitioned(
        spark, UNITS, fn_ok, out_dir, run_id="c2", max_parallel_units=4
    )
    assert m["units_run"] == 1 and m["units_skipped_resume"] == 3
    assert C.read_run(spark, out_dir).count() == 200


def test_staged_bucket_scan_is_partition_pruned(spark, out_dir, tmp_path):
    """The run_job staging pattern: a per-unit filter on the staged
    bucket column must prune partitions at the parquet scan (one pruned
    scan per unit, never a full rescan)."""
    staged = str(tmp_path / "staged")
    df = spark.range(1000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(8)).alias("bucket")
    )
    df.write.mode("overwrite").partitionBy("bucket").parquet(staged)
    part = spark.read.parquet(staged).where(F.col("bucket") == 3)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert part.select(F.count(F.lit(1))).first()[0] > 0
