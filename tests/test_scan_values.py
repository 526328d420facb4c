"""Scan-layer floor filter (P1, reference helpers.py:31/conf:2)."""

import pandas as pd

from pyspark.sql import functions as F

from topo_descriptors_spark.sources.io import scan_values


def test_min_elevation_floor(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"y": [0, 1, 2, 3], "value": [5.0, -100.0, -150.0, -99.9]})
    )
    out = scan_values(df).toPandas().sort_values("y")
    # <= -100 nulled (the reference keeps strictly-greater values)
    assert out["value"].isna().tolist() == [False, True, True, False]
    assert out["is_orig_null"].tolist() == [False, True, True, False]


def test_custom_floor(spark):
    df = spark.createDataFrame(pd.DataFrame({"y": [0, 1], "value": [5.0, -1.0]}))
    out = scan_values(df, min_value=0.0).toPandas().sort_values("y")
    assert out["value"].isna().tolist() == [False, True]
