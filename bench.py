"""Benchmark harness.

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf",
plus derived throughput fields}.

The flagship workload is the north-star pipeline: a deterministic
pre-tokenized table of BASELINE.json:input_hint shape
(doc_id, tokens array<int32>, n_tok, source) is exploded into per-token
sequences, multiscale window features + a directional one-sided max are
computed per sequence, and a point-in-time as-of join attaches the
features to sampled query positions.  Throughput = sequences/sec.

``--scaling`` mode: run the identical flagship job at local[8] and
local[32] in fresh JVMs (subprocesses), report throughput at both and
the scaling efficiency (thr32/thr8)/4, and write BENCH/BASELINE.md.
This is the sandbox proxy for the north rule's N -> 4N executor
requirement (no real cluster available here).

Each timed query is fully materialized through the `noop` sink so
column pruning cannot skip work.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FLAGSHIP_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "5000"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def flagship_tokens(spark, n_docs: int):
    """North-star pipeline over the input_hint-shaped table."""
    from pyspark.sql import functions as F

    from topo_descriptors_spark.operators import window as W
    from topo_descriptors_spark.operators.asof import asof_join
    from topo_descriptors_spark.sources import synthetic

    tok = synthetic.documents_tok(spark, n_docs=n_docs)
    seq = tok.select(
        "doc_id",
        F.posexplode("tokens").alias("pos", "token"),
    ).select("doc_id", "pos", F.col("token").cast("double").alias("value"))
    feats = W.multiscale_features(
        seq, [3, 9, 25], sigmas=[1.0], value="value", entity="doc_id", order="pos"
    )
    feats = W.sx_1d(
        feats, radius_steps=5, height=0.0, step_meters=1.0,
        value="value", entity="doc_id", order="pos",
    )
    # point-in-time queries: 8 deterministic positions per doc
    q = tok.select(
        "doc_id", "n_tok", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("qi")
    ).select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id", "qi"), F.col("n_tok")).cast("long").alias("q_pos"),
    )
    joined = asof_join(
        q,
        feats.select("doc_id", "pos", "tpi_9", "std_25", "smooth_1p0", "sx"),
        on="doc_id", q_ts="q_pos", s_ts="pos",
    )
    return joined


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline subset of the driver-contract queries."""
    import __spark_entry__ as entrymod

    names = [
        "w_tpi_multiscale",
        "w_gaussian_ma",
        "w_backfill",
        "w_sessionize",
        "j_asof_events",
        "j_asof_orders_strict",
        "t_quality",
        "d_minhash_pairs",
        "d_ngram_jaccard",
        "d_simhash",
        "s_ann_topk",
    ]
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        _materialize(qs[name](spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_single(sf_dir: str, cores: str, n_docs: int, queries: bool = True) -> dict:
    from topo_descriptors_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cores}]",
                      shuffle_partitions=max(int(cores) if cores.isdigit() else 32, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen once with a trivial job
    spark.range(1000).count()

    t0 = time.monotonic()
    _materialize(flagship_tokens(spark, n_docs))
    flagship_sec = time.monotonic() - t0

    per_query = bench_queries(spark, sf_dir) if queries else {}
    per_query = {"flagship_tokens": round(flagship_sec, 3), **per_query}
    total = round(sum(per_query.values()), 3)
    return {
        "metric": "asof-join + multiscale window-feature suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_of(sf_dir),
        "flagship_docs": n_docs,
        "sequences_per_sec": round(n_docs / flagship_sec, 1),
        "cores": cores,
    }


def run_scaling(sf_dir: str, n_docs: int) -> dict:
    """local[8] vs local[32] on the identical flagship job (fresh JVMs)."""
    results = {}
    for cores in ("8", "32"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", cores,
             "--sf-dir", sf_dir, "--docs", str(n_docs), "--flagship-only"],
            capture_output=True, text=True, timeout=3000,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    thr8 = results["8"]["sequences_per_sec"]
    thr32 = results["32"]["sequences_per_sec"]
    eff = round((thr32 / thr8) / 4.0, 3)
    report = {
        "metric": "scaling efficiency local[8]->local[32] (N->4N proxy)",
        "throughput_seq_per_sec": {"local8": thr8, "local32": thr32},
        "efficiency": eff,
        "flagship_docs": n_docs,
    }
    _write_baseline_md(report, results)
    return report


def _write_baseline_md(report: dict, results: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput + scaling evidence\n\n"
            "North rule: >=0.8 throughput scaling efficiency from N to 4N\n"
            "executors.  Sandbox proxy (no real cluster): the identical\n"
            "flagship job (explode pre-tokenized docs -> multiscale window\n"
            "features + directional max -> as-of join) at local[8] vs\n"
            "local[32] in fresh JVMs, same input, same plan.\n\n"
            f"| config | sequences/sec | flagship sec |\n|---|---|---|\n"
            f"| local[8] | {results['8']['sequences_per_sec']} | "
            f"{results['8']['queries']['flagship_tokens']} |\n"
            f"| local[32] | {results['32']['sequences_per_sec']} | "
            f"{results['32']['queries']['flagship_tokens']} |\n\n"
            f"**efficiency = (thr32 / thr8) / 4 = {report['efficiency']}**\n\n"
            f"flagship corpus: {report['flagship_docs']} synthetic docs of\n"
            "BASELINE.json:input_hint shape (deterministic, seed-fixed).\n"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--docs", type=int, default=FLAGSHIP_DOCS)
    ap.add_argument("--flagship-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir, args.docs)))
        return

    res = run_single(args.sf_dir, args.cores, args.docs,
                     queries=not args.flagship_only)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
