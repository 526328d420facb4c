"""Per-query isolation bench (optimization round 9).

``bench.py`` is FROZEN for measurement; this sidecar times individual
declared queries through the same noop-sink methodology (guide §1.4) at
any sf_dir, labels jobs (guide §1.5), and captures
``.explain("formatted")`` per query into ``plans/r09/`` so plan claims
in OPTIMIZATION_r09.md are auditable.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries s_cosine_topk_join,d_minhash_pairs --repeats 3 \
        [--plans-suffix before] [--out /tmp/x.json]

The two bench-only variants of d_minhash_pairs / d_ngram_jaccard (full
documents table, same parameters bench.py times) are reproduced here so
numbers line up with BENCH_r0*.json rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", default="",
                    help="comma-separated declared-query names")
    ap.add_argument("--flagship", action="store_true",
                    help="also time bench.py's flagship_real[/packed] pair")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-suffix", default=None,
                    help="write plans/r09/<q>_<suffix>.txt explain dumps")
    ap.add_argument("--out", default=None)
    ap.add_argument("--conf", action="append", default=[],
                    metavar="K=V", help="extra spark conf for A/B runs")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from topo_descriptors_spark.operators import dedup as _dd
    from topo_descriptors_spark.session import get_spark
    from topo_descriptors_spark.sources.io import read_table as _rt

    qs = dict(entrymod.queries())
    # bench.py's full-table variants (gate inputs are halved; bench is not)
    qs["d_minhash_pairs"] = lambda s, d: _dd.minhash_dedup_pairs(
        _rt(s, d, "documents"), num_perms=16, bands=16, threshold=0.4
    )
    qs["d_ngram_jaccard"] = lambda s, d: _dd.ngram_jaccard_pairs(
        _rt(s, d, "documents"), shingle_n=3, threshold=0.12, max_df=100
    )

    n_cores = int(args.cores) if args.cores.isdigit() else 32
    factor = 16 if n_cores >= 16 else 4
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("bench-extra", master=f"local[{args.cores}]",
                      shuffle_partitions=max(factor * n_cores, 8),
                      extra=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query {n!r}")
    if args.flagship:
        import bench as benchmod

        qs["flagship_real"] = lambda s, d: benchmod.flagship_real(s, d)
        qs["flagship_real_packed"] = (
            lambda s, d: benchmod.flagship_real_packed(s, d))
        qs["flagship_tokens"] = (
            lambda s, d: benchmod.flagship_tokens(s, benchmod.FLAGSHIP_DOCS))
        qs["flagship_packed"] = (
            lambda s, d: benchmod.flagship_packed(s, benchmod.FLAGSHIP_DOCS))
        names += ["flagship_real", "flagship_real_packed",
                  "flagship_tokens", "flagship_packed"]

    if args.plans_suffix:
        os.makedirs("plans/r09", exist_ok=True)
        for n in names:
            df = qs[n](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r09/{n}_{args.plans_suffix}.txt", "w") as fh:
                fh.write(plan)

    if args.repeats < 1:  # plans-only invocation
        print(json.dumps({"plans_only": True, "queries": names}))
        return

    # warm-up (codegen + Arrow workers), then interleaved repeats
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        _materialize(qs[n](spark, args.sf_dir))
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(args.repeats, 1)):
        for n in names:
            spark.sparkContext.setJobDescription(f"timed:{n}")
            t0 = time.monotonic()
            _materialize(qs[n](spark, args.sf_dir))
            times[n].append(time.monotonic() - t0)
    spark.sparkContext.setJobDescription(None)

    med = {n: round(sorted(ts)[len(ts) // 2], 3) for n, ts in times.items()}
    out = {
        "sf_dir": args.sf_dir, "cores": args.cores,
        "repeats": args.repeats,
        "queries_median": med,
        "queries_runs": {n: [round(t, 3) for t in ts]
                         for n, ts in times.items()},
        "total_of_medians": round(sum(med.values()), 3),
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
