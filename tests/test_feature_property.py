"""Property-based checks for the round-4 feature operators: OHLC bars vs
a pandas resample oracle, count-min sketch invariants over arbitrary
key distributions.

Set ``SPARK_GRAFT_PROP_SCALE`` (float multiplier) for a deep sweep; see
``test_asof_property.py``.
"""

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topo_descriptors_spark.operators.features import cms_counts, resample_ohlc

_SCALE = float(os.environ.get("SPARK_GRAFT_PROP_SCALE", "1"))


def _n(base: int) -> int:
    return max(1, int(base * _SCALE))


@st.composite
def ohlc_case(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # unique event id (tie-break)
                draw(st.integers(1, 3)),  # entity
                draw(st.integers(0, 7200)),  # seconds offset -> bucket ties
                draw(st.floats(-100, 100, allow_nan=False, width=32)),
            )
        )
    return rows


@settings(
    max_examples=_n(10), deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=ohlc_case())
def test_ohlc_matches_pandas_resample(spark, case):
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        [(eid, ent, base + pd.Timedelta(seconds=s), v) for eid, ent, s, v in case],
        columns=["event_id", "entity_id", "ts", "value"],
    )
    out = resample_ohlc(
        spark.createDataFrame(pdf), 3600, tiebreak="event_id"
    ).toPandas()
    # pandas oracle: stable-sort by (ts, event_id), group by hour bucket
    pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
    pdf["bucket_start"] = (pdf.ts.astype("int64") // 10**9 // 3600) * 3600
    g = pdf.groupby(["entity_id", "bucket_start"])["value"]
    want = pd.DataFrame(
        {
            "open": g.first(), "high": g.max(), "low": g.min(),
            "close": g.last(), "n": g.count(),
        }
    ).reset_index()
    got = out.sort_values(["entity_id", "bucket_start"]).reset_index(drop=True)
    want = want.sort_values(["entity_id", "bucket_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ("open", "high", "low", "close"):
        assert got[col].tolist() == pytest.approx(want[col].tolist())
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()


keys = st.one_of(
    st.integers(-1000, 1000),
    st.text(alphabet="abcxyz", min_size=0, max_size=4),
)


@settings(
    max_examples=_n(8), deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ks=st.lists(keys, min_size=1, max_size=80))
def test_cms_never_underestimates(spark, ks):
    ks = [str(k) for k in ks]
    df = spark.createDataFrame([(k,) for k in ks], "k string")
    out = cms_counts(df, "k", depth=3, width=8).collect()  # tiny -> collisions
    true = {k: ks.count(k) for k in set(ks)}
    assert len(out) == len(true)
    for r in out:
        assert r.n_true == true[r.k]
        assert r.est >= r.n_true  # CMS one-sided error, always
        assert r.est <= len(ks)  # cell count can never exceed table size
