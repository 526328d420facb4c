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


def test_packed_vs_naive_per_doc_oracle(spark):
    """Randomized ragged shapes (seeded) vs an independent naive per-doc
    oracle with explicit loops — catches any cross-doc leakage in the
    batch-concatenation arithmetic."""
    import pandas as pd

    from topo_descriptors_spark.functions.planner import (
        frame_half_width,
        gaussian_weights,
    )

    rng = np.random.RandomState(23)
    lens = np.concatenate([[1, 2, 3, 4, 5], rng.randint(1, 40, size=40)])
    docs, qs = [], []
    for n in lens:
        docs.append(rng.randint(0, 1000, size=n).astype(np.int32))
        qpool = np.unique(np.concatenate([[0, n - 1],
                                          rng.randint(0, n, size=3)]))
        qs.append(qpool.astype(np.int64))
    pdf = pd.DataFrame(
        {
            "doc_key": np.arange(len(lens), dtype=np.int64),
            "tokens": docs,
            "q_positions": qs,
        }
    )
    got = (
        PK.packed_features_at(
            spark.createDataFrame(pdf), [3, 9], sigmas=[1.0],
            sx_radius_steps=3, sx_height=0.5, sx_step_meters=2.0,
        )
        .toPandas()
        .sort_values(["doc_key", "pos"])
        .reset_index(drop=True)
    )

    w1 = gaussian_weights(1.0)
    r1 = len(w1) // 2

    def naive(v, i):
        out = {}
        n = len(v)
        for d in (3, 9):
            k = frame_half_width(d)
            fr = v[max(0, i - k): i + k + 1]
            if len(fr) > 1:
                out[f"tpi_{d}"] = v[i] - (fr.sum() - v[i]) / (len(fr) - 1)
                out[f"std_{d}"] = float(np.std(fr, ddof=1))
            else:
                out[f"tpi_{d}"] = np.nan
                out[f"std_{d}"] = np.nan
        num = den = 0.0
        for j, wt in enumerate(w1):
            p = i + j - r1
            if 0 <= p < n:
                num += v[p] * wt
                den += wt
        out["smooth_1p0"] = num / den
        best = np.nan
        for k in range(1, 4):
            if i - k >= 0:
                ang = np.degrees(np.arctan((v[i - k] - v[i] - 0.5) / (k * 2.0)))
                best = ang if np.isnan(best) else max(best, ang)
        out["sx"] = best
        return out

    # the same (doc, pos) may appear once per query draw; iterate rows
    for row in got.itertuples():
        v = docs[int(row.doc_key)].astype(np.float64)
        exp = naive(v, int(row.pos))
        for c, e in exp.items():
            g = getattr(row, c)
            assert (np.isnan(e) and np.isnan(g)) or abs(g - e) < 1e-9, (
                row.doc_key, row.pos, c, g, e,
            )


def test_packed_query_position_out_of_range_raises(spark):
    """A query position >= the doc's length must raise (it would
    otherwise silently gather the NEXT document's values), naming the
    offending doc."""
    import pandas as pd
    import pytest as pt

    from topo_descriptors_spark.operators import packed as PK

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_key": ["a", "b"],
                "tokens": [[1, 2, 3, 4], [5, 6, 7]],
                "q_positions": [[0, 3], [1, 3]],  # b has len 3 -> pos 3 invalid
            }
        )
    )
    with pt.raises(Exception, match="out of range"):
        PK.packed_features_at(df, [3], sigmas=[1.0]).collect()
