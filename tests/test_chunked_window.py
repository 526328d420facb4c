"""Chunked (skew-proof) window features == plain window features on
dense integer positions, including a hot entity."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import window as W


@pytest.fixture(scope="module")
def seq(spark):
    rows = []
    rng = np.random.RandomState(5)
    for eid, n in [("hot", 5000), ("a", 137), ("b", 64), ("c", 3)]:
        vals = rng.standard_normal(n) * 10
        for p in range(n):
            rows.append((eid, p, float(vals[p])))
    pdf = pd.DataFrame(rows, columns=["entity_id", "pos", "value"])
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return df


def test_chunked_equals_plain(seq):
    plain = W.multiscale_features(
        seq, [3, 9, 25], sigmas=[1.0], value="value", entity="entity_id", order="pos"
    ).toPandas()
    chunked = W.multiscale_features_chunked(
        seq, [3, 9, 25], sigmas=[1.0], chunk_size=512,
        value="value", entity="entity_id", order="pos",
    ).toPandas()
    assert len(plain) == len(chunked)
    key = ["entity_id", "pos"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = chunked.sort_values(key).reset_index(drop=True)
    for c in ["tpi_3", "tpi_9", "tpi_25", "std_3", "std_9", "std_25", "smooth_1p0"]:
        assert np.allclose(
            a[c].to_numpy(float), b[c].to_numpy(float), atol=1e-12, equal_nan=True
        ), c


def test_chunked_task_bound(seq):
    chunked = W.sequence_chunks_with_halo(seq, chunk_size=512, halo=12)
    sizes = chunked.groupBy("entity_id", "_chunk").count().toPandas()
    # no task sees more than chunk_size + 2*halo rows
    assert sizes["count"].max() <= 512 + 2 * 12
    # the hot entity spans many chunks
    assert (sizes["entity_id"] == "hot").sum() >= 9
