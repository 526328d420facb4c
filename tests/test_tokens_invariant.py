"""North-rule per-row invariant: token arrays pass through the feature
pipeline byte-equal (BASELINE.json input_hint)."""

import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import window as W
from topo_descriptors_spark.operators.asof import asof_join
from topo_descriptors_spark.sources import synthetic


def test_input_hint_schema(spark):
    tok = synthetic.documents_tok(spark, n_docs=50)
    assert dict(tok.dtypes) == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }
    # n_tok invariant
    assert tok.where(F.size("tokens") != F.col("n_tok")).count() == 0
    # source skew present (web dominates)
    top = tok.groupBy("source").count().orderBy(F.desc("count")).first()
    assert top["source"] == "web"


def test_token_passthrough_exact(spark):
    tok = synthetic.documents_tok(spark, n_docs=200).cache()
    seq = tok.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_id", "pos", F.col("token").cast("double").alias("value"))
    feats = W.multiscale_features(
        seq, [3, 9], sigmas=None, value="value", entity="doc_id", order="pos"
    )
    # per-doc feature summary, joined back onto the token table
    summary = feats.groupBy("doc_id").agg(
        F.avg("tpi_9").alias("tpi_mean"), F.avg("std_9").alias("std_mean")
    )
    out = tok.join(summary, "doc_id", "left")
    # EXACT token-array equality per row after the pipeline
    joined = out.alias("o").join(tok.alias("i"), "doc_id")
    mismatches = joined.where(F.col("o.tokens") != F.col("i.tokens")).count()
    assert mismatches == 0
    assert out.count() == 200
    assert out.where(F.col("tpi_mean").isNull()).count() == 0


def test_token_passthrough_through_asof(spark):
    tok = synthetic.documents_tok(spark, n_docs=100).cache()
    seq = tok.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_id", "pos", F.col("token").cast("double").alias("value"))
    q = tok.select("doc_id", "tokens", "n_tok", (F.col("n_tok") - 1).cast("long").alias("q_pos"))
    joined = asof_join(
        q, seq.withColumnRenamed("value", "last_val"),
        on="doc_id", q_ts="q_pos", s_ts="pos",
    )
    # every doc matched its last token; tokens column untouched
    bad = joined.where(
        F.col("last_val") != F.element_at("tokens", F.col("n_tok")).cast("double")
    ).count()
    assert bad == 0
    check = joined.alias("o").join(tok.alias("i"), "doc_id").where(
        F.col("o.tokens") != F.col("i.tokens")
    )
    assert check.count() == 0
