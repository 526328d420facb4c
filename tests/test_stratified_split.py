"""stratified_split (pipeline.py): per-stratum proportions, independent
hash streams, default fallback."""

from __future__ import annotations

import pytest

from topo_descriptors_spark.operators import pipeline as P
from topo_descriptors_spark.sources.io import read_table


def test_stratified_proportions_and_independence(spark):
    n = 4000
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = P.stratified_split(
        df,
        {"a": {"train": 0.9, "test": 0.1}, "b": {"train": 0.5, "test": 0.5}},
    ).toPandas()
    a = out[out.source == "a"].split.value_counts(normalize=True)
    b = out[out.source == "b"].split.value_counts(normalize=True)
    assert a["train"] == pytest.approx(0.9, abs=0.03)
    assert b["train"] == pytest.approx(0.5, abs=0.03)


def test_stratified_streams_independent(spark):
    # the SAME ids under two strata with identical 50/50 weights must
    # land differently for some ids (per-stratum salt = independent
    # hash streams)
    ids = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    w5050 = {"train": 0.5, "test": 0.5}
    from pyspark.sql import functions as F

    as_a = P.stratified_split(
        ids.withColumn("source", F.lit("a")), {"a": w5050}
    ).select("doc_id", "split").toPandas().sort_values("doc_id")
    as_b = P.stratified_split(
        ids.withColumn("source", F.lit("b")), {"b": w5050}
    ).select("doc_id", "split").toPandas().sort_values("doc_id")
    diff = (as_a.split.to_numpy() != as_b.split.to_numpy()).mean()
    assert 0.3 < diff < 0.7  # ~half the ids flip between streams


def test_stratified_default_and_unmatched(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "known")], "doc_id long, source string"
    )
    w = {"known": {"train": 1.0}}
    with_default = {
        r["doc_id"]: r["split"]
        for r in P.stratified_split(
            df, w, default_weights={"other": 1.0}
        ).collect()
    }
    assert with_default[3] == "train"
    assert with_default[1] == with_default[2] == "other"
    # no default -> surfaced as NULL, never silently bucketed
    no_default = {
        r["doc_id"]: r["split"]
        for r in P.stratified_split(df, w).collect()
    }
    assert no_default[1] is None


def test_stratified_rerun_and_repartition_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    w = {"src0": {"train": 0.7, "val": 0.3}}
    a = P.stratified_split(docs, w, default_weights={"train": 1.0})\
        .select("doc_id", "split").toPandas().sort_values("doc_id")
    b = P.stratified_split(docs.repartition(7), w,
                           default_weights={"train": 1.0})\
        .select("doc_id", "split").toPandas().sort_values("doc_id")
    assert (a.split.to_numpy() == b.split.to_numpy()).all()


def test_stratified_empty_weights_raises(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="empty"):
        P.stratified_split(docs, {})
