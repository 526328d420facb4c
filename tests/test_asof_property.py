"""Property-based as-of correctness: random state/query sets vs a pure
pandas oracle (hypothesis drives shapes, ties, duplicates, empties).

Example counts default to a Spark-roundtrip-friendly budget; set
``SPARK_GRAFT_PROP_SCALE=15`` (any float multiplier) for a deep sweep —
the round-8 sweep ran all six as-of variants at 150 examples each with
zero counterexamples.
"""

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topo_descriptors_spark.operators.asof import asof_join

_SCALE = float(os.environ.get("SPARK_GRAFT_PROP_SCALE", "1"))


def _n(base: int) -> int:
    return max(1, int(base * _SCALE))

entities = st.sampled_from(["a", "b", "c"])


@st.composite
def asof_case(draw):
    n_state = draw(st.integers(0, 25))
    n_q = draw(st.integers(1, 25))
    state = [
        (
            draw(entities),
            draw(st.integers(0, 50)),  # coarse ts -> plenty of exact ties
            draw(st.one_of(st.none(), st.floats(-100, 100, allow_nan=False))),
        )
        for _ in range(n_state)
    ]
    queries = [
        (draw(entities), draw(st.integers(0, 50)), i) for i in range(n_q)
    ]
    return state, queries


def _pandas_oracle(state, queries, strict):
    out = []
    for ent, q_ts, q_id in queries:
        cands = [
            (ts, v)
            for (e, ts, v) in state
            if e == ent and (ts < q_ts if strict else ts <= q_ts)
        ]
        if cands:
            ts = max(t for t, _ in cands)
            # engine tie rule on duplicate state ts: max payload struct wins
            v = max((v for t, v in cands if t == ts), key=lambda x: (x is not None, x))
            out.append((q_id, ts, v))
        else:
            out.append((q_id, None, None))
    return sorted(out)


@pytest.mark.parametrize("strict", [False, True])
@settings(
    max_examples=_n(12),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_matches_pandas_oracle(spark, strict, case):
    state, queries = case
    # dedup state to one row per (entity, ts) with max value (engine
    # requires unique state keys for determinism)
    best = {}
    for e, ts, v in state:
        k = (e, ts)
        if k not in best or (v is not None and (best[k] is None or v > best[k])):
            best[k] = v
    state = [(e, ts, v) for (e, ts), v in best.items()]

    s_pd = pd.DataFrame(state, columns=["entity_id", "ts", "value"])
    q_pd = pd.DataFrame(queries, columns=["entity_id", "q_ts", "q_id"])
    s_df = spark.createDataFrame(s_pd) if len(s_pd) else spark.createDataFrame(
        [], "entity_id string, ts bigint, value double"
    )
    q_df = spark.createDataFrame(q_pd)
    out = asof_join(
        q_df, s_df, on="entity_id", q_ts="q_ts", s_ts="ts", strict=strict
    ).toPandas()
    got = sorted(
        (
            int(r.q_id),
            None if pd.isna(r.matched_ts) else int(r.matched_ts),
            None if pd.isna(r.value) else float(r.value),
        )
        for r in out.itertuples()
    )
    expect = _pandas_oracle(state, queries, strict)
    assert got == expect


@st.composite
def interval_case(draw):
    n_ev = draw(st.integers(1, 20))
    n_iv = draw(st.integers(0, 10))
    events = [
        (i, draw(entities), float(draw(st.integers(0, 300))))
        for i in range(n_ev)
    ]
    ivals = []
    for j in range(n_iv):
        lo = draw(st.integers(0, 300))
        hi = lo + draw(st.integers(0, 150))  # includes zero-length
        ivals.append((draw(entities), j, float(lo), float(hi)))
    W = float(draw(st.sampled_from([1, 7, 50, 100, 500])))
    return events, ivals, W


@settings(max_examples=_n(25), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(interval_case())
def test_interval_join_matches_naive(spark, case):
    """Bucketed interval join == naive BETWEEN join for every bucket
    width, including widths smaller and larger than every interval."""
    from topo_descriptors_spark.operators.asof import interval_join

    events, ivals, W = case
    ev = spark.createDataFrame(
        pd.DataFrame(events, columns=["event_id", "k", "t"])
    )
    iv = (
        spark.createDataFrame(pd.DataFrame(ivals, columns=["k", "iid", "lo", "hi"]))
        if ivals
        else spark.createDataFrame([], "k string, iid bigint, lo double, hi double")
    )
    got = interval_join(
        ev, iv, on="k", ts="t", start="lo", end="hi", bucket_seconds=W
    ).toPandas()
    expect = {
        (e_id, j)
        for (e_id, ek, et) in events
        for (ik, j, lo, hi) in ivals
        if ek == ik and lo <= et <= hi
    }
    assert set(zip(got.event_id, got.iid)) == expect


def _pandas_oracle_forward(state, queries, strict):
    out = []
    for ent, q_ts, q_id in queries:
        cands = [
            (ts, v)
            for (e, ts, v) in state
            if e == ent and (ts > q_ts if strict else ts >= q_ts)
        ]
        if cands:
            ts = min(t for t, _ in cands)
            v = max((v for t, v in cands if t == ts), key=lambda x: (x is not None, x))
            out.append((q_id, ts, v))
        else:
            out.append((q_id, None, None))
    return sorted(out)


def _pandas_oracle_nearest(state, queries, strict=False):
    out = []
    for ent, q_ts, q_id in queries:
        cands = [
            (ts, v) for (e, ts, v) in state
            if e == ent and (ts != q_ts if strict else True)
        ]
        if not cands:
            out.append((q_id, None, None))
            continue
        best_gap = min(abs(ts - q_ts) for ts, _ in cands)
        at_gap = [ts for ts, _ in cands if abs(ts - q_ts) == best_gap]
        ts = min(at_gap)  # tie -> backward (earlier timestamp)
        v = max((v for t, v in cands if t == ts), key=lambda x: (x is not None, x))
        out.append((q_id, ts, v))
    return sorted(out)


def _dedup_state(state):
    best = {}
    for e, ts, v in state:
        k = (e, ts)
        if k not in best or (v is not None and (best[k] is None or v > best[k])):
            best[k] = v
    return [(e, ts, v) for (e, ts), v in best.items()]


def _run_engine(spark, state, queries, **kw):
    s_pd = pd.DataFrame(state, columns=["entity_id", "ts", "value"])
    q_pd = pd.DataFrame(queries, columns=["entity_id", "q_ts", "q_id"])
    s_df = spark.createDataFrame(s_pd) if len(s_pd) else spark.createDataFrame(
        [], "entity_id string, ts bigint, value double"
    )
    out = asof_join(
        spark.createDataFrame(q_pd), s_df, on="entity_id",
        q_ts="q_ts", s_ts="ts", **kw,
    ).toPandas()
    return sorted(
        (
            int(r.q_id),
            None if pd.isna(r.matched_ts) else int(r.matched_ts),
            None if pd.isna(r.value) else float(r.value),
        )
        for r in out.itertuples()
    )


@pytest.mark.parametrize("strict", [False, True])
@settings(
    max_examples=_n(10), deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_forward_matches_pandas_oracle(spark, strict, case):
    state, queries = case
    state = _dedup_state(state)
    got = _run_engine(spark, state, queries, direction="forward", strict=strict)
    want = sorted(
        (q, ts, None if v is None else float(v))
        for q, ts, v in _pandas_oracle_forward(state, queries, strict)
    )
    assert got == want


@pytest.mark.parametrize("strict", [False, True])
@settings(
    max_examples=_n(10), deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_nearest_matches_pandas_oracle(spark, strict, case):
    state, queries = case
    state = _dedup_state(state)
    got = _run_engine(spark, state, queries, direction="nearest",
                      strict=strict)
    want = sorted(
        (q, ts, None if v is None else float(v))
        for q, ts, v in _pandas_oracle_nearest(state, queries, strict)
    )
    assert got == want
