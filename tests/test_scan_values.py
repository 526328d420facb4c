"""Scan-layer floor filter (P1, reference helpers.py:31/conf:2)."""

import pandas as pd
import pytest

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


def test_zorder_write_skips_files_on_both_dimensions(spark, tmp_path):
    """Z-order keeps every file narrow in BOTH columns: a selective
    filter on either dimension touches a strict subset of files, where
    the lexicographic layout only prunes its leading column."""
    import os

    from pyspark.sql import functions as F

    from topo_descriptors_spark.sources.io import write_table

    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("x"),
        F.pmod(F.col("id"), F.lit(n)).alias("y"),
        F.rand(11).alias("noise"),
    )

    zpath = str(tmp_path / "zorder")
    write_table(grid, zpath, zorder_by=["x", "y"], n_files=16)
    assert len([f for f in os.listdir(zpath) if f.endswith(".parquet")]) == 16

    lexpath = str(tmp_path / "lex")
    write_table(grid, lexpath, cluster_by=["x", "y"], n_files=16)

    def files_touched(path, col):
        return (
            spark.read.parquet(path)
            .where(F.col(col).between(10, 25))  # 1/16th of either range
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # leading column: both layouts prune hard
    assert files_touched(zpath, "x") <= 8
    assert files_touched(lexpath, "x") <= 2
    # trailing column: lexicographic CANNOT prune (every file spans all
    # of y); z-order still touches only a subset
    assert files_touched(lexpath, "y") == 16
    assert files_touched(zpath, "y") <= 8


def test_zorder_validates(spark):
    from topo_descriptors_spark.sources.io import write_table, zorder_col

    df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match=">= 2"):
        zorder_col(df, ["x"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_table(df, "/tmp/nope", cluster_by=["x"], zorder_by=["x", "y"])


def test_zorder_preserves_rows_and_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    from topo_descriptors_spark.sources.io import write_table

    df = spark.range(1000).select(
        F.col("id").alias("x"), F.pmod(F.col("id") * 7, F.lit(100)).alias("y"),
        F.lit("payload").alias("s"),
    )
    p = str(tmp_path / "z")
    write_table(df, p, zorder_by=["x", "y"], n_files=4)
    back = spark.read.parquet(p)
    assert sorted(back.columns) == ["s", "x", "y"]  # no _zval/_zmin leakage
    assert back.count() == 1000
    assert back.agg(F.sum("x")).collect()[0][0] == 999 * 1000 // 2
