"""Packed-sequence engine parity: the zero-shuffle array path must
reproduce the exploded window+as-of pipeline feature-for-feature."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import packed as PK
from topo_descriptors_spark.operators import window as W
from topo_descriptors_spark.operators.asof import asof_join
from topo_descriptors_spark.sources import synthetic

FEATS = ["tpi_9", "std_25", "smooth_1p0", "sx"]


@pytest.fixture(scope="module")
def tok(spark):
    df = synthetic.documents_tok(spark, n_docs=150).withColumn(
        "doc_key", F.xxhash64("doc_id")
    )
    df.cache().count()
    return df


def _exploded_reference(tok):
    seq = tok.select(
        "doc_key", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_key", "pos", F.col("token").cast("double").alias("value"))
    feats = W.multiscale_features(
        seq, [3, 9, 25], sigmas=[1.0], value="value",
        entity="doc_key", order="pos",
    )
    feats = W.sx_1d(
        feats, radius_steps=5, height=0.0, step_meters=1.0,
        value="value", entity="doc_key", order="pos",
    )
    q = tok.select(
        "doc_key", "n_tok",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("qi"),
    ).select(
        "doc_key",
        F.pmod(F.xxhash64("doc_key", "qi"), F.col("n_tok"))
        .cast("long").alias("q_pos"),
    )
    return asof_join(
        q, feats.select("doc_key", "pos", *FEATS),
        on="doc_key", q_ts="q_pos", s_ts="pos",
    )


def test_packed_matches_exploded_asof(tok):
    ref = (
        _exploded_reference(tok)
        .select("doc_key", F.col("q_pos").alias("pos"), *FEATS)
        .toPandas()
    )
    got = PK.packed_features_at(
        PK.deterministic_query_positions(tok, 8),
        [3, 9, 25], sigmas=[1.0], sx_radius_steps=5,
        sx_height=0.0, sx_step_meters=1.0, keep_cols=("doc_key",),
    ).select("doc_key", "pos", *FEATS).toPandas()

    key = ["doc_key", "pos"] + FEATS
    a = ref.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert (a["doc_key"] == b["doc_key"]).all()
    assert (a["pos"] == b["pos"]).all()
    for c in FEATS:
        assert np.allclose(a[c], b[c], atol=1e-9, equal_nan=True), c


def test_packed_plan_has_no_shuffle(tok):
    out = PK.packed_features_at(
        PK.deterministic_query_positions(tok, 8),
        [3, 9], sigmas=[1.0], sx_radius_steps=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_packed_short_and_single_token_docs(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_key": np.array([1, 2], dtype=np.int64),
            "tokens": [np.array([5], dtype=np.int32),
                       np.array([1, 2, 3], dtype=np.int32)],
            "q_positions": [np.array([0], dtype=np.int64),
                            np.array([0, 2], dtype=np.int64)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        PK.packed_features_at(df, [3], sigmas=[1.0], sx_radius_steps=2)
        .toPandas()
        .sort_values(["doc_key", "pos"])
        .reset_index(drop=True)
    )
    # single-token doc: tpi/std undefined (no neighbors), sx undefined
    assert np.isnan(out.loc[0, "tpi_3"]) and np.isnan(out.loc[0, "std_3"])
    assert np.isnan(out.loc[0, "sx"])
    assert out.loc[0, "smooth_1p0"] == pytest.approx(5.0)  # renormalized
    # 3-token doc at pos 2: backward sx over 2 lags exists
    assert not np.isnan(out.loc[2, "sx"])
