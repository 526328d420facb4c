"""Matched-filter bank (W5 1-D recast): a planted valley is detected by
the V-shape filter with a positive score at the valley floor."""

import numpy as np
import pandas as pd

from topo_descriptors_spark.operators.window import matched_filter_bank

FILTERS = {
    "vshape": [2.0, 1.0, 0.0, 1.0, 2.0],
    "ridge": [-2.0, -1.0, 0.0, -1.0, -2.0],
}


def test_valley_detected(spark):
    # flat signal with one V-shaped dip at pos 10 and one ridge at pos 30
    vals = np.zeros(50)
    vals[8:13] = [-1, -2, -4, -2, -1]
    vals[28:33] = [1, 2, 4, 2, 1]
    pdf = pd.DataFrame(
        {
            "entity_id": "e",
            "ts": np.arange(50),
            "value": vals,
        }
    )
    out = matched_filter_bank(
        spark.createDataFrame(pdf), FILTERS, entity="entity_id", order="ts"
    ).toPandas().sort_values("ts")
    at_valley = out[out.ts == 10].iloc[0]
    at_ridge = out[out.ts == 30].iloc[0]
    assert at_valley.mf_id == "vshape" and at_valley.mf_score > 0
    assert at_ridge.mf_id == "ridge" and at_ridge.mf_score > 0
    # flat region far from features: scores ~0
    flat = out[(out.ts > 38) & (out.ts < 46)]
    assert (flat.mf_score.abs() < 1e-9).all()
