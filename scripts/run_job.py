"""spark-submit entry point: checkpointed, resumable feature-engineering
job over the pre-tokenized corpus.

Usage (local sandbox):

    python scripts/run_job.py --out /tmp/tds_out --docs 2000 --buckets 8

Cluster form (the north rule's submission path):

    zip -r tds.zip topo_descriptors_spark/
    spark-submit --py-files tds.zip scripts/run_job.py \\
        --out s3://bucket/features --docs <N> --buckets 256

Each bucket of documents is one work unit: computed, written to
``out/part=<bucket>`` and marked complete; rerunning after a crash
resumes from the marker table (see plans/checkpoint.py).  Lineage and
per-unit metrics are persisted next to the output.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--run-id", default="job")
    args = ap.parse_args()

    from topo_descriptors_spark.operators import window as W
    from topo_descriptors_spark.plans import checkpoint as C
    from topo_descriptors_spark.session import get_spark
    from topo_descriptors_spark.sources import synthetic

    spark = get_spark("tds-job")
    spark.sparkContext.setLogLevel("WARN")

    tok = synthetic.documents_tok(spark, n_docs=args.docs)
    tok = tok.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(args.buckets))
    )

    # Stage the input ONCE, hash-partitioned by bucket, so each work unit
    # reads a partition-PRUNED scan.  Filtering the unstaged table per
    # unit would rescan the whole input N_units times: a pmod(xxhash64)
    # predicate cannot prune parquet.  The staged table is reused on
    # resume (guarded by its _SUCCESS marker).
    staged = os.path.join(args.out, "_staged_input")
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        tok.write.mode("overwrite").partitionBy("bucket").parquet(staged)
    tok_staged = spark.read.parquet(staged)

    def unit_fn(bucket):
        part = tok_staged.where(F.col("bucket") == int(bucket))
        seq = part.select(
            "doc_id", F.posexplode("tokens").alias("pos", "token")
        ).select("doc_id", "pos", F.col("token").cast("double").alias("value"))
        feats = W.multiscale_features(
            seq, [3, 9, 25], sigmas=[1.0], value="value",
            entity="doc_id", order="pos",
        )
        summary = feats.groupBy("doc_id").agg(
            F.avg("tpi_9").alias("tpi9_mean"),
            F.avg("std_25").alias("std25_mean"),
            F.avg("smooth_1p0").alias("smooth_mean"),
        )
        # token arrays pass through byte-exact (north-rule invariant)
        return part.join(summary, "doc_id", "left").drop("bucket")

    lineage = {
        "input": "synthetic documents_tok (seed 42)",
        "docs": args.docs,
        "scales_pxl": [3, 9, 25],
        "sigmas": [1.0],
    }
    metrics = C.run_partitioned(
        spark,
        list(range(args.buckets)),
        unit_fn,
        args.out,
        run_id=args.run_id,
        lineage=lineage,
    )

    # publish the completed run as one atomic table version: a
    # METADATA-ONLY snapshot commit over the part dirs the units already
    # wrote (no data movement) — lineage + counter metrics persisted
    # alongside the snapshot.  Row count comes from the marker table
    # (covers units completed by previous resumed runs too).
    from topo_descriptors_spark.sources import snapshots as S

    total_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(args.out, "_markers"))
        .agg(F.sum("n_rows"))
        .first()[0]
    )
    version = S.commit_dirs(
        args.out,
        [f"part={b}" for b in range(args.buckets)],
        unit_fn(0).schema,  # plan-time schema, no job
        lineage={**lineage, "run_id": args.run_id, "metrics": metrics},
        row_count=int(total_rows),
    )
    print({**metrics, "snapshot_version": version})


if __name__ == "__main__":
    main()
