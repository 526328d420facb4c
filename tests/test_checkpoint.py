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
        C.run_partitioned(spark, UNITS, crashing, out_dir, run_id="r1")
    assert calls == ["u0", "u1"]
    assert C.completed_units(spark, out_dir) == {"u0", "u1"}

    # restart: only pending units run
    calls.clear()
    metrics = C.run_partitioned(spark, UNITS, fn, out_dir, run_id="r2")
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
