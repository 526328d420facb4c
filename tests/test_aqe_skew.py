"""AQE skew-join evidence: a pathologically skewed equi-join must be
split by OptimizeSkewedJoin at runtime (the engine's claimed backstop
for residual skew the structural bucketing doesn't cover)."""

from contextlib import contextmanager

import pytest

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        # 98% of the left side lands on one key -> one giant partition
        left = spark.range(300_000).select(
            F.when(F.pmod(F.col("id"), 100) < 98, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.rand(1).alias("v"),
        )
        right = spark.range(2_000).select(
            F.pmod(F.col("id"), 50).alias("k"), F.lit("x").alias("tag")
        )
        j = left.join(right, "k").groupBy().count()
        n = j.collect()[0][0]
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
