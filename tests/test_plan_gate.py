"""The plan-audit GATE (VERDICT r6 #4): the adjudicated plan posture is
a committed allowlist, and any NEW nested-loop join, row-at-a-time
Python UDF, or eager build-time action must FAIL — proven here by
construction, not just claimed.
"""

import importlib.util
import os

import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and plan_audit)


# ------------------------------------------------------- gate unit logic


def _clean_row(**over):
    row = {
        "row_python_udfs": 0,
        "nested_loop_joins": 0,
        "eager_action_jobs": 0,
    }
    row.update(over)
    return row


def test_gate_passes_clean_report():
    report = {"q1": _clean_row(), "g_tpi_2d": _clean_row(nested_loop_joins=1)}
    assert plan_audit.gate_violations(report) == []


def test_gate_trips_on_new_row_udf():
    v = plan_audit.gate_violations({"q1": _clean_row(row_python_udfs=1)})
    assert len(v) == 1 and "row-at-a-time" in v[0]


def test_gate_trips_on_nested_loop_over_budget():
    # budget 0 for unknown queries; budget 1 for adjudicated ones
    v = plan_audit.gate_violations({"q1": _clean_row(nested_loop_joins=1)})
    assert len(v) == 1 and "nested-loop" in v[0]
    v = plan_audit.gate_violations(
        {"g_tpi_2d": _clean_row(nested_loop_joins=2)}
    )
    assert len(v) == 1 and "budget 1" in v[0]


def test_gate_trips_on_undeclared_eager_action():
    v = plan_audit.gate_violations({"q1": _clean_row(eager_action_jobs=1)})
    assert len(v) == 1 and "ALLOWED_EAGER" in v[0]
    # declared-eager queries pass the same count
    assert plan_audit.gate_violations(
        {"k_cms_counts": _clean_row(eager_action_jobs=1)}
    ) == []


def test_gate_trips_on_audit_error():
    v = plan_audit.gate_violations({"q1": {"err": "ValueError: boom"}})
    assert len(v) == 1 and "audit error" in v[0]


def test_gate_trips_on_exchange_growth():
    """VERDICT r7 #4: a query whose shuffle count grows past its
    committed baseline must fail even with a clean UDF/NL/eager posture."""
    name = "j_dim_join"
    base = plan_audit.EXCHANGE_BASELINE[name]
    v = plan_audit.gate_violations({name: _clean_row(exchanges=base + 1)})
    assert len(v) == 1 and "shuffle count grew" in v[0]
    # at or below baseline passes (a decrease is an improvement)
    assert plan_audit.gate_violations(
        {name: _clean_row(exchanges=base)}) == []
    assert plan_audit.gate_violations(
        {name: _clean_row(exchanges=max(base - 1, 0))}) == []


def test_gate_trips_on_missing_baseline_entry():
    """A NEW query (no committed baseline row) must fail until its
    shuffle count is consciously committed."""
    v = plan_audit.gate_violations(
        {"brand_new_query": _clean_row(exchanges=0)})
    assert len(v) == 1 and "plan_exchange_baseline" in v[0]


def test_exchange_baseline_covers_contract():
    """Every contract query has a committed baseline row (and no
    orphans), so the growth gate can never silently skip one."""
    import __spark_entry__ as em

    assert set(plan_audit.EXCHANGE_BASELINE) == set(em.queries())


# ------------------------------- failing-by-construction on REAL plans


def test_audit_detects_real_row_python_udf(spark):
    """A genuine row-at-a-time Python UDF (the §2.10 violation the gate
    exists for) must be counted by audit_one and fail the gate."""
    bad_udf = F.udf(lambda s: (s or "")[:3], "string")

    def offending(spark_, sf_dir):
        docs = read_table(spark_, sf_dir, "documents")
        return docs.select("doc_id", bad_udf("text").alias("prefix"))

    row = plan_audit.audit_one(spark, offending, SF, "offending_udf")
    assert row["row_python_udfs"] >= 1
    v = plan_audit.gate_violations({"offending_udf": row})
    assert any("row-at-a-time" in m for m in v)


def test_audit_detects_real_eager_collect(spark):
    """A driver-side collect baked into query BUILD (the anti-pattern
    the eager check exists for) must be machine-detected — schema-probe
    'load at' jobs must NOT count, so a lazy control stays clean."""

    def offending(spark_, sf_dir):
        ev = read_table(spark_, sf_dir, "events")
        top = [r.user_id for r in
               ev.groupBy("user_id").count().orderBy(F.desc("count"))
               .limit(3).collect()]  # the violation
        return ev.where(F.col("user_id").isin(top))

    def lazy_control(spark_, sf_dir):
        ev = read_table(spark_, sf_dir, "events")
        return ev.groupBy("user_id").count()

    bad = plan_audit.audit_one(spark, offending, SF, "offending_eager")
    good = plan_audit.audit_one(spark, lazy_control, SF, "lazy_control")
    assert bad["eager_action_jobs"] >= 1
    assert good["eager_action_jobs"] == 0
    v = plan_audit.gate_violations({"offending_eager": bad,
                                    "lazy_control": good})
    assert any("ALLOWED_EAGER" in m for m in v)


def test_contract_sample_passes_gate(spark):
    """A sample of real contract queries — one lazy, one with the
    adjudicated broadcast-scalar nested loop, one Arrow kernel — must
    pass the gate exactly as committed."""
    import __spark_entry__ as em

    qs = em.queries()
    report = {
        name: plan_audit.audit_one(spark, qs[name], SF, name)
        for name in ("j_dim_join", "g_tpi_2d", "w_gaussian_arrow")
    }
    assert report["g_tpi_2d"]["nested_loop_joins"] == 1  # scalar attach
    assert plan_audit.gate_violations(report) == []
