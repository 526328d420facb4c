"""Portable Bloom filter (operators/bloom.py): no false negatives,
bounded false positives, null semantics, plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import bloom as B
from topo_descriptors_spark.sources.io import read_table


def test_bloom_no_false_negatives_bounded_fp(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 5 = 0").select("text")
    m, g = 1 << 14, 3
    bl = B.bloom_build(bench, "text", m_bits=m, g_hashes=g)
    got = (
        B.bloom_prune(docs, "text", bl, m_bits=m, g_hashes=g)
        .withColumn("exact", F.col("doc_id") % 5 == 0)
        .groupBy("bloom_hit", "exact").count().collect()
    )
    by = {(r["bloom_hit"], r["exact"]): r["count"] for r in got}
    # every true member hits (no false negatives)
    assert (False, True) not in by
    # FP rate within 5x of the analytic expectation (tiny counts -> slack)
    n_bench = bench.count()
    n_neg = sum(v for (h, e), v in by.items() if not e)
    fp = by.get((True, False), 0) / max(n_neg, 1)
    assert fp <= max(5 * B.bloom_fp_rate(n_bench, m, g), 0.02)


def test_bloom_null_probes_false(spark):
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    probe = spark.createDataFrame([("a",), (None,)], "k string")
    bl = B.bloom_build(keys, "k", m_bits=64, g_hashes=2)
    rows = {
        r["k"]: r["bloom_hit"]
        for r in B.bloom_prune(probe, "k", bl, m_bits=64, g_hashes=2).collect()
    }
    assert rows["a"] is True
    assert rows[None] is False


def test_bloom_build_validation(spark):
    keys = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="multiple of 32"):
        B.bloom_build(keys, "k", m_bits=100)
    with pytest.raises(ValueError, match="g_hashes"):
        B.bloom_build(keys, "k", m_bits=64, g_hashes=0)
    bl = B.bloom_build(keys, "k", m_bits=64)
    with pytest.raises(ValueError, match="bloom_build"):
        B.bloom_prune(keys, "k", keys)  # not a bloom result
    probe = spark.createDataFrame([("a", True)], "k string, bloom_hit boolean")
    with pytest.raises(ValueError, match="collision"):
        B.bloom_prune(probe, "k", bl)


def test_bloom_words_shape_and_determinism(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    w1 = B.bloom_build(keys, "k", m_bits=1024, g_hashes=2).collect()[0]["words"]
    w2 = B.bloom_build(keys.repartition(7), "k", m_bits=1024, g_hashes=2)\
        .collect()[0]["words"]
    assert len(w1) == 1024 // 32
    assert w1 == w2  # partitioning-invariant (bit_or is commutative)
    assert all(0 <= x < (1 << 32) for x in w1)  # 32 bits per word, no sign bit


def test_bloom_probe_plan_no_corpus_shuffle(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    bl = B.bloom_build(docs.limit(10).select("text"), "text", m_bits=1024)
    plan = B.bloom_prune(docs, "text", bl, m_bits=1024)._jdf\
        .queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # only the build side shuffles (word-index agg); the corpus branch is
    # scan -> broadcast-nested-loop(1 row) -> project
    assert plan.count("Exchange") <= 3
