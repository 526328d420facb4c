"""Similarity search: brute-force correctness vs numpy, ANN recall."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    n, d = 120, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    # plant two near-duplicates
    vecs[7] = vecs[3] + 0.001 * rng.standard_normal(d).astype(np.float32)
    vecs[50] = vecs[20] * 1.7  # same direction, different magnitude
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return df, vecs


def _numpy_topk(vecs, k):
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 9)
    np.fill_diagonal(cos, -np.inf)
    out = {}
    for i in range(len(vecs)):
        # order by cosine desc then id asc (matching the engine tie rule)
        order = sorted(range(len(vecs)), key=lambda j: (-cos[i, j], j))
        out[i] = [(j, cos[i, j]) for j in order[:k]]
    return out


def test_cosine_topk_vs_numpy(emb):
    df, vecs = emb
    out = S.cosine_topk(df, k=5).toPandas()
    expect = _numpy_topk(vecs.astype(np.float64), 5)
    got = {}
    for r in out.itertuples():
        got.setdefault(r.id_a, []).append((r.rank, r.id_b, r.cosine))
    assert len(got) == len(vecs)
    for i, lst in got.items():
        lst.sort()
        ids = [j for _, j, _ in lst]
        exp_ids = [j for j, _ in expect[i]]
        assert ids == exp_ids, f"row {i}: {ids} != {exp_ids}"
        for (_, _, c), (_, ce) in zip(lst, expect[i]):
            assert abs(c - ce) < 1e-6


def test_near_dup_pairs(emb):
    df, _ = emb
    pairs = S.embedding_near_dup_pairs(df, threshold=0.99).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (3, 7) in found
    assert (20, 50) in found  # same direction => cosine ~1 despite scaling


def test_ann_recall(emb):
    df, vecs = emb
    exact = S.cosine_topk(df, k=3).toPandas()
    approx = S.ann_topk_lsh(df, k=3, n_planes=2).toPandas()
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}
    a = {(r.id_a, r.id_b) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # 2 planes on 120 random vectors -> ~4 buckets of ~30; measured
    # deterministic recall 0.544; the planted near-dup must survive
    assert recall > 0.4, recall
    assert (3, 7) in a


def test_ann_blocked_equals_expression_form(emb):
    df, _ = emb
    a = S.ann_topk_lsh(df, k=3, n_planes=4).toPandas()
    b = S.ann_topk_blocked(df, k=3, n_planes=4).toPandas()
    key = ["id_a", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert a["id_b"].tolist() == b["id_b"].tolist()
    assert np.allclose(a["cosine"], b["cosine"], atol=1e-9)


def test_ivf_recall_beats_lsh(emb):
    df, _ = emb
    exact = S.cosine_topk(df, k=3).toPandas()
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}
    ivf = S.ivf_topk(df, k=3, n_clusters=8, n_probe=3).toPandas()
    i = {(r.id_a, r.id_b) for r in ivf.itertuples()}
    recall = len(e & i) / len(e)
    # multiprobe IVF on 120 vecs / 8 cells: high recall, planted pair found
    assert recall > 0.6, recall
    assert (3, 7) in i
    # every query answered with exactly k (or fewer if probes tiny)
    counts = ivf.groupby("id_a").size()
    assert counts.max() <= 3


def test_ann_plan_is_bucketed_join(emb):
    df, _ = emb
    plan = S.ann_topk_lsh(df, k=3, n_planes=4)._jdf.queryExecution().executedPlan().toString()
    # candidate join must be an equi-join on the bucket (hash or sort-merge),
    # NOT a cartesian/broadcast-nested-loop
    assert "CartesianProduct" not in plan


def test_ivf_lloyd_refinement_improves_recall(emb):
    df, _ = emb
    exact = S.cosine_topk(df, k=3).toPandas()
    e = {(r.id_a, r.id_b) for r in exact.itertuples()}

    def recall(lloyd_steps):
        got = S.ivf_topk(
            df, k=3, n_clusters=8, n_probe=2, lloyd_steps=lloyd_steps
        ).toPandas()
        g = {(r.id_a, r.id_b) for r in got.itertuples()}
        return len(e & g) / len(e)

    r0, r2 = recall(0), recall(2)
    # Lloyd-refined centroids spread the cells -> better recall than the
    # crude lowest-id pick (measured on this fixture: r0 < r2); refined
    # must also be deterministic (same result twice)
    assert r2 >= r0, (r0, r2)
    assert r2 > 0.5, (r0, r2)
    again = recall(2)
    assert again == r2


def test_ann_planning_launches_no_job(emb):
    """With dim passed, building the ANN plans must not trigger .first()
    (i.e. no Spark job at plan-construction time)."""
    df, _ = emb
    guarded = df.select("vec_id", "embedding")

    def boom(*a, **k):
        raise AssertionError("plan construction launched a Spark action")

    guarded.first = boom
    guarded.head = boom
    S.ann_topk_lsh(guarded, k=3, n_planes=4, dim=16)
    S.ann_topk_blocked(guarded, k=3, n_planes=4, dim=16)
    S.embedding_near_dup_pairs(guarded, threshold=0.99, dim=16)


def test_random_projection_preserves_distances(emb):
    """JL property: pairwise distances in the projected space track the
    originals (sampled pairs, generous tolerance), and the projection is
    deterministic + shuffle-free."""
    df, vecs = emb
    out = S.random_projection(df, out_dim=8, dim=16, seed=11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    pdf = out.select("vec_id", "proj").toPandas().set_index("vec_id")
    proj = np.stack(pdf.loc[np.arange(len(vecs)), "proj"].to_numpy())
    rng = np.random.RandomState(0)
    pairs = rng.randint(0, len(vecs), size=(60, 2))
    d0 = np.linalg.norm(vecs[pairs[:, 0]] - vecs[pairs[:, 1]], axis=1)
    d1 = np.linalg.norm(proj[pairs[:, 0]] - proj[pairs[:, 1]], axis=1)
    ok = (d0 > 0)
    ratio = d1[ok] / d0[ok]
    # 16 -> 8 dims: distortion concentrated around 1 (JL), no blow-ups
    assert 0.3 < ratio.min() and ratio.max() < 1.9
    assert abs(np.median(ratio) - 1.0) < 0.25


def test_cosine_topk_quarantine_guard(spark):
    big = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="quarantined"):
        S.cosine_topk(big, k=1, max_rows=100)
    # override works, and the default bound passes small inputs
    assert S.cosine_topk(big, k=1, max_rows=None).count() > 0
    assert S.cosine_topk(big, k=1).count() > 0


def test_exact_pairs_guarded_helper(emb):
    """embedding_cosine_pairs_exact: values match numpy, and the
    max_rows quarantine raises instead of launching an all-pairs plan."""
    df, vecs = emb
    out = S.embedding_cosine_pairs_exact(
        df, threshold=0.9, round_digits=9
    ).toPandas()
    norm = vecs.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 9)
    expect = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if cos[i, j] >= 0.9
    }
    assert set(zip(out.id_a, out.id_b)) == expect
    for _, r in out.iterrows():
        assert r.cosine == pytest.approx(cos[int(r.id_a), int(r.id_b)])
    with pytest.raises(ValueError, match="quarantined"):
        S.embedding_cosine_pairs_exact(df, threshold=0.9, max_rows=50)


def test_ann_bucket_stats_reports_skew(spark):
    """Highly correlated embeddings collapse into one sign pattern —
    ann_bucket_stats must surface the hot bucket."""
    rng = np.random.RandomState(0)
    base = rng.standard_normal(16)
    vecs = (base + 0.01 * rng.standard_normal((200, 16))).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                      "embedding": list(vecs)})
    )
    stats = S.ann_bucket_stats(df, n_planes=6, dim=16).toPandas()
    assert stats["count"].max() == 200  # every vector in one bucket


def test_ann_max_bucket_splits_hot_bucket(spark):
    """With max_bucket set, the hot bucket is deterministically salted
    into sub-shards: every vector still gets k neighbors, neighbors stay
    genuinely high-cosine, and the result is reproducible."""
    rng = np.random.RandomState(1)
    base = rng.standard_normal(16)
    vecs = (base + 0.01 * rng.standard_normal((200, 16))).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                      "embedding": list(vecs)})
    )
    out = S.ann_topk_blocked(
        df, k=3, n_planes=6, dim=16, max_bucket=32
    ).toPandas()
    assert (out.groupby("id_a").size() == 3).all()
    assert len(out) == 200 * 3
    assert (out.cosine > 0.99).all()  # correlated fixture: all near-dups
    again = S.ann_topk_blocked(
        df, k=3, n_planes=6, dim=16, max_bucket=32
    ).toPandas()
    a = out.sort_values(["id_a", "rank"]).reset_index(drop=True)
    b = again.sort_values(["id_a", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_quantize_roundtrip_error_bound(emb):
    """int8 quantization: values in [-127, 127], dequantization error
    bounded by scale/2 elementwise, zero vectors stay zero."""
    df, vecs = emb
    q = S.quantize_embeddings(df)
    back = S.dequantize_embeddings(q).toPandas().set_index("vec_id")
    for vid in [0, 3, 50, 119]:
        orig = vecs[vid].astype(np.float64)
        scale = float(back.loc[vid, "qscale"])
        qa = np.array(back.loc[vid, "q"])
        deq = np.array(back.loc[vid, "embedding_deq"])
        assert np.abs(qa).max() <= 127
        assert scale == pytest.approx(np.abs(orig).max() / 127.0)
        assert np.allclose(deq, qa * scale)
        assert np.abs(deq - orig).max() <= scale / 2 + 1e-12


def test_quantize_zero_vector(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 0.0, 0.0]]})
    )
    r = S.quantize_embeddings(df).first()
    assert r.qscale == 0.0 and list(r.q) == [0, 0, 0]


def test_zero_norm_vectors_excluded_everywhere(spark):
    """A zero vector has no defined cosine (0/0 = NaN), and Spark orders
    NaN ABOVE every number — so unguarded, `cosine >= t` admits spurious
    pairs and top-k ranks NaN first (ADVICE r3).  Every cosine path must
    exclude zero-norm rows."""
    import pandas as pd

    from topo_descriptors_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
        embedding_cosine_pairs_exact,
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "embedding": [[1.0, 0.0], [1.0, 0.1], [0.0, 0.0]],
            }
        )
    )
    pairs = embedding_cosine_pairs_exact(df, threshold=0.5).toPandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == {(1, 2)}  # no NaN pairs
    assert not pairs.cosine.isna().any()

    topk = cosine_topk(df, k=2).toPandas()
    assert 3 not in set(topk.id_a) and 3 not in set(topk.id_b)
    assert not topk.cosine.isna().any()

    lsh = embedding_near_dup_pairs(df, threshold=0.5, n_planes=2, dim=2).toPandas()
    assert 3 not in set(lsh.id_a) and 3 not in set(lsh.id_b)

    ann = ann_topk_lsh(df, k=2, n_planes=2, dim=2).toPandas()
    assert 3 not in set(ann.id_a) and 3 not in set(ann.id_b)
    assert not ann.cosine.isna().any()


def test_ann_blocked_excludes_degenerate_embeddings_like_lsh_twin(spark):
    """Regression pin (r8 edge probe): zero-norm and empty-array rows
    reached ann_topk_blocked's BLAS kernels — NaN normalization for the
    zero-norms and a raw np.stack ValueError (stage killer) for the
    empties — while the expression twin filtered them.  Both twins must
    exclude them and agree; an all-degenerate input yields empty, not a
    driver TypeError from the dim probe."""
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [[0.0, 0.0], [], [1.0, 0.25], [0.9, 0.3]],
        }
    )
    df = spark.createDataFrame(pdf)
    blocked = S.ann_topk_blocked(df, k=2, n_planes=2).toPandas()
    expr = S.ann_topk_lsh(df, k=2, n_planes=2).toPandas()
    key = ["id_a", "rank"]
    pd.testing.assert_frame_equal(
        blocked.sort_values(key).reset_index(drop=True)[["id_a", "id_b", "cosine"]],
        expr.sort_values(key).reset_index(drop=True)[["id_a", "id_b", "cosine"]],
    )
    assert set(blocked.id_a) <= {3, 4}

    degenerate = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[0.0], []]})
    )
    assert S.ann_topk_blocked(degenerate, k=1).count() == 0
