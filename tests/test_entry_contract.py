"""Driver-contract invariants: every query has an oracle, and shared
query inputs hold their construction invariants at the smallest SF."""

import sys

import pytest

from pyspark.sql import functions as F

sys.path.insert(0, ".")

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o), sorted(set(q) ^ set(o))
    assert len(q) >= 50


def test_grid_is_dense_at_smallest_sf(spark, sf_dir):
    """sf0.001 leaves event-id gaps; the grid the 2-D queries share must
    still be a full GRID_N x GRID_N lattice with no nulls (the
    reflect-padded kernels are only defined on a dense domain)."""
    g = E._grid_from_events(spark, sf_dir)
    assert g.count() == E.GRID_N ** 2
    assert g.where(F.col("value").isNull()).count() == 0
    bounds = g.agg(
        F.min("y"), F.max("y"), F.min("x"), F.max("x")
    ).first()
    assert tuple(bounds) == (0, E.GRID_N - 1, 0, E.GRID_N - 1)


def test_entry_smoke(spark):
    out = E.entry(spark)
    assert out.count() > 0
    assert "matched_ts" in out.columns
