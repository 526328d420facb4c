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


def test_clustered_write_enables_file_skipping(spark, tmp_path):
    """cluster_by gives each file a narrow key range: a selective range
    filter after the write must touch a strict subset of the files."""
    import os

    from pyspark.sql import functions as F

    from topo_descriptors_spark.sources.io import write_table

    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.rand(7).alias("noise"),
    )
    path = str(tmp_path / "clustered")
    write_table(df, path, cluster_by=["id"], n_files=16)
    data_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(data_files) == 16

    narrow = (
        spark.read.parquet(path)
        .where(F.col("id").between(1000, 2000))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert narrow <= 2  # 1/16th of the range -> at most a file or two
    # sanity: the same filter on an unclustered write touches many files
    messy = str(tmp_path / "messy")
    df.repartition(16).write.parquet(messy)
    wide = (
        spark.read.parquet(messy)
        .where(F.col("id").between(1000, 2000))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert wide > narrow
