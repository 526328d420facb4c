"""Round-6 ADVICE fixes: retrieval-guard NULL ids, blocked-kernel NULL
corpus vectors + rounding convention, salted_agg map-typed columns, and
cms_counts broadcast-join fallback for user-sized grids."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


# ------------------------------------------------ retrieval guard (NULL ids)


def test_retrieval_guard_null_query_ids_dedicated_error(spark):
    from topo_descriptors_spark.operators.similarity import cosine_topk_join

    qs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(10, [1.0, 1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="must be non-null"):
        cosine_topk_join(qs, corpus, k=1)


def test_retrieval_guard_duplicate_ids_still_distinct_error(spark):
    from topo_descriptors_spark.operators.similarity import cosine_topk_join

    qs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(10, [1.0, 1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="must be distinct"):
        cosine_topk_join(qs, corpus, k=1)


# -------------------------------------- blocked kernel: NULL corpus vectors


def test_blocked_excludes_null_corpus_embeddings_like_base(spark):
    from topo_descriptors_spark.operators.similarity import (
        cosine_topk_join,
        cosine_topk_join_blocked,
    )

    rng = np.random.default_rng(7)
    qs = spark.createDataFrame(
        [(i, rng.standard_normal(4).tolist()) for i in range(3)],
        "vec_id int, embedding array<double>",
    )
    corpus_rows = [(100 + i, rng.standard_normal(4).tolist()) for i in range(8)]
    corpus_rows.insert(3, (999, None))  # NULL embedding mid-table
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id int, embedding array<double>"
    )
    base = sorted(
        (r.id_q, r.rank, r.id_c)
        for r in cosine_topk_join(qs, corpus, k=3).collect()
    )
    blocked = sorted(
        (r.id_q, r.rank, r.id_c)
        for r in cosine_topk_join_blocked(qs, corpus, k=3).collect()
    )
    assert base == blocked
    assert all(idc != 999 for _, _, idc in base)


# ------------------------------------------- blocked kernel: rounding rule


def test_round_half_away_matches_duckdb_not_bankers():
    from topo_descriptors_spark.operators.similarity import _round_half_away

    x = np.array([0.25, -0.25, 0.35, 2.5e-1, 0.125])
    got = _round_half_away(x, 1)
    # half-AWAY-from-zero: 0.25 -> 0.3 (np.round's half-to-even gives 0.2)
    assert got[0] == pytest.approx(0.3)
    assert got[1] == pytest.approx(-0.3)
    assert np.round(x[0], 1) == pytest.approx(0.2)  # the old behavior
    # non-boundary values unchanged vs np.round
    assert _round_half_away(np.array([0.123456]), 3)[0] == pytest.approx(0.123)


def test_blocked_kernel_inlined_rounding_is_half_away_end_to_end(spark):
    """The mapInPandas score closure inlines its own copy of the
    half-away-from-zero rounding (deliberately, to stay self-contained);
    only the _round_half_away helper was unit-pinned, so the two copies
    could silently diverge (ADVICE r6).  This routes an exact rounding
    boundary through cosine_topk_join_blocked END-TO-END: a one-hot
    query against an all-ones 16-dim corpus vector scores cosine
    exactly 0.25 (binary-exact: 1/sqrt(16)*1), which at round_digits=1
    is 0.3 under half-away-from-zero but 0.2 under numpy's half-to-even
    — and the base form's F.round (decimal HALF_UP) agrees on 0.3."""
    from topo_descriptors_spark.operators.similarity import (
        cosine_topk_join,
        cosine_topk_join_blocked,
    )

    qs = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 15)], "vec_id int, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (100, [1.0] * 16),    # cosine +0.25 -> 0.3 (half-even: 0.2)
            (101, [-1.0] * 16),   # cosine -0.25 -> -0.3 (half-even: -0.2)
            (102, [1.0] + [0.0] * 15),  # cosine 1.0, rank 1
        ],
        "vec_id int, embedding array<double>",
    )
    got = {
        r.id_c: r.cosine
        for r in cosine_topk_join_blocked(
            qs, corpus, k=3, round_digits=1
        ).collect()
    }
    assert got[100] == pytest.approx(0.3)   # NOT 0.2: half-away, both signs
    assert got[101] == pytest.approx(-0.3)
    assert got[102] == pytest.approx(1.0)
    base = {
        r.id_c: r.cosine
        for r in cosine_topk_join(qs, corpus, k=3, round_digits=1).collect()
    }
    assert base == {k: pytest.approx(v) for k, v in got.items()}


# --------------------------------------------- salted_agg map-typed columns


def test_salted_agg_skips_map_columns_in_default_salt(spark):
    from topo_descriptors_spark.operators.features import salted_agg

    df = spark.createDataFrame(
        [("a", 1.0, {"x": 1}), ("a", 2.0, {"y": 2}), ("b", 3.0, {"z": 3})],
        "k string, v double, payload map<string,int>",
    )
    # pre-fix this raised at analysis time (xxhash64 rejects maps)
    got = {r.k: (r.v_count, r.v_sum) for r in
           salted_agg(df, "k", {"v": ["count", "sum"]}, salt_buckets=4).collect()}
    assert got == {"a": (2, 3.0), "b": (1, 3.0)}


def test_xxhashable_type_predicate():
    from pyspark.sql import types as T

    from topo_descriptors_spark.operators.features import _xxhashable

    assert _xxhashable(T.StringType())
    assert _xxhashable(T.ArrayType(T.IntegerType()))
    assert not _xxhashable(T.MapType(T.StringType(), T.IntegerType()))
    assert not _xxhashable(
        T.ArrayType(T.MapType(T.StringType(), T.IntegerType()))
    )
    assert not _xxhashable(
        T.StructType([T.StructField(
            "m", T.MapType(T.StringType(), T.IntegerType()))])
    )


# --------------------------------------- cms_counts broadcast-join fallback


def test_cms_broadcast_join_form_matches_literal_form(spark):
    from topo_descriptors_spark.operators import features as FT

    rows = [(i % 23,) for i in range(500)]
    df = spark.createDataFrame(rows, "k int")
    lit_form = {r.k: (r.est, r.n_true) for r in
                FT.cms_counts(df, "k", depth=4, width=64).collect()}
    # force the broadcast-join path at the same grid size
    old = FT._CMS_LITERAL_CELLS
    FT._CMS_LITERAL_CELLS = 1
    try:
        join_form = {r.k: (r.est, r.n_true) for r in
                     FT.cms_counts(df, "k", depth=4, width=64).collect()}
    finally:
        FT._CMS_LITERAL_CELLS = old
    assert lit_form == join_form


def test_cms_user_sized_grid_does_not_embed_literals(spark):
    from topo_descriptors_spark.operators.features import cms_counts

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    # 4 x 8192 = 32768 cells > threshold -> broadcast-join path; a wide
    # sketch on tiny data is collision-free, so est == n_true exactly
    out = {r.k: (r.est, r.n_true) for r in
           cms_counts(df, "k", depth=4, width=8192).collect()}
    assert out == {"a": (5, 5), "b": (3, 3), "c": (1, 1)}


def test_cms_join_fallback_plan_is_broadcast_only(spark):
    from topo_descriptors_spark.operators import features as FT

    df = spark.createDataFrame([("a",)] * 9 + [("b",)], "k string")
    old = FT._CMS_LITERAL_CELLS
    FT._CMS_LITERAL_CELLS = 1
    try:
        out = FT.cms_counts(df, "k", depth=4, width=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        FT._CMS_LITERAL_CELLS = old
    # one broadcast join per depth level, never a shuffled join
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_run_available_now_pins_state_partitions(spark, tmp_path):
    import pandas as pd

    from topo_descriptors_spark.streaming.sessions import (
        run_available_now,
        sessionize_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    # epoch-micros longs sidestep parquet timestamp-annotation pitfalls
    # (pandas writes ns INT64 that Spark refuses as timestamp[_ntz]);
    # sentinel flush event in a later file: append-mode session output
    # only emits sessions the watermark has passed (the standard drain
    # trick, same as test_streaming.py)
    base = 1704067200_000000  # 2024-01-01 00:00 UTC in micros
    pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts_us": [base, base + 600_000_000, base + 3_600_000_000],
        "value": [1.0, 2.0, 3.0],
    }).to_parquet(src / "a_part0.parquet")
    pd.DataFrame({
        "user_id": [9999],
        "ts_us": [base + 90 * 86400_000_000],  # far future
        "value": [0.0],
    }).to_parquet(src / "b_flush.parquet")
    ev = (spark.readStream.schema("user_id long, ts_us long, value double")
          .option("maxFilesPerTrigger", 1)
          .parquet(str(src))
          .select("user_id", F.timestamp_micros("ts_us").alias("ts"), "value"))
    sess = sessionize_stream(ev, gap_seconds=3600, watermark="1 hour")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    run_available_now(sess, str(tmp_path / "out"), str(tmp_path / "ckp"),
                      n_state_partitions=2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # the checkpoint records the pinned state partition count
    import json as _json
    meta = _json.loads((tmp_path / "ckp" / "offsets" / "0").read_text()
                       .splitlines()[1])
    assert meta["conf"]["spark.sql.shuffle.partitions"] == "2"
    out = spark.read.parquet(str(tmp_path / "out")).where("user_id != 9999")
    assert out.count() == 2  # two sessions (gap > 1h splits user 1 vs 2)


def test_arrow_kernels_run_without_package_on_worker_path(tmp_path):
    """Workers must not need the repo on their import path: get_spark
    auto-ships the package zip (cloudpickle serializes module-level
    kernel helpers BY REFERENCE — pre-fix this died mid-task with
    ModuleNotFoundError whenever the driver cwd wasn't the repo)."""
    import subprocess
    import sys

    repo = "/root/repo"
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "from topo_descriptors_spark import get_spark\n"
        "from topo_descriptors_spark.operators import tiles as T\n"
        "from pyspark.sql import functions as F\n"
        "spark = get_spark('iso-pin', master='local[2]', shuffle_partitions=4)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "g = spark.range(256).select((F.col('id')/16).cast('int').alias('y'),"
        " F.pmod(F.col('id'), F.lit(16)).cast('int').alias('x'),"
        " (F.col('id')*1.0).alias('value'))\n"
        "assert T.tpi_2d(g, (16, 16), size=5, tile_size=8).count() == 256\n"
        "print('ISO-OK')\n" % repo
    )
    env = {k: v for k, v in __import__("os").environ.items()
           if k != "PYTHONPATH"}  # the env var would mask the bug
    r = subprocess.run([sys.executable, "-c", script], cwd=str(tmp_path),
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ISO-OK" in r.stdout


def test_round_half_away_matches_duckdb_round_exactly():
    """Cross-engine pin for the blocked kernel's rounding: DuckDB ROUND
    (the oracle engine) agrees bit-for-bit on 20k seeded values incl.
    near-boundary multiples of 2.5e-9 — the residual divergence risk is
    only vs Spark's decimal-string HALF_UP, as documented."""
    import duckdb

    from topo_descriptors_spark.operators.similarity import _round_half_away

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-1, 1, 20000),
        np.array([0.25e-8 * k for k in range(-10, 11)]),
    ])
    con = duckdb.connect()
    duck = con.execute(
        "select round(v, 9) from (select unnest(?) v)", [x.tolist()]
    ).fetchnumpy()
    dv = next(iter(duck.values()))
    assert np.abs(_round_half_away(x, 9) - dv).max() == 0.0
