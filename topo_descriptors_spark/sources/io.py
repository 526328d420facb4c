"""Table IO — parquet now, Iceberg-ready interface.

The engine's scan/sink layer (SURVEY.md §2.1).  In this sandbox there is
no Iceberg catalog, so tables are parquet directories behind the same
narrow interface the Iceberg implementation would use (`read_table` /
`write_table` with a `format` switch); swapping the format string and a
catalog config is the only change needed on a real cluster.

Scan-side rules encoded here:

* the min-elevation floor filter is applied AT SCAN TIME so Catalyst
  pushes it into the parquet reader (reference helpers.py:31, conf:2);
* cropping for windowed computation must keep halo context: filter to
  crop ∪ halo before computing, exact-crop after (the reference computes
  on the full domain and crops at write — helpers.py:59, topo.py:138-140;
  pruning to the crop alone silently changes boundary results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from topo_descriptors_spark.config import CFG

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet"
) -> DataFrame:
    return spark.read.format(fmt).load(f"{sf_dir}/{name}.parquet")


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TPCH_TABLES}


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Table sink.  ``cluster_by`` range-partitions the data on those
    columns and sorts within each output file, so each file covers a
    narrow, non-overlapping key range — parquet min/max footer stats
    then let later range/equality scans SKIP whole files (the poor
    man's clustering an Iceberg sort-order would give).  ``n_files``
    bounds the file count for the clustered layout."""
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        if n_files:
            df = df.repartitionByRange(int(n_files), *cols)
        else:
            df = df.repartitionByRange(*cols)
        df = df.sortWithinPartitions(*cols)
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def scan_values(
    df: DataFrame, value: str = "value", min_value: float | None = None
) -> DataFrame:
    """Null out values at/below the floor (reference helpers.py:31).

    Expressed as a column rewrite (value -> NULL) rather than a row
    filter so positions survive for the null-mask replay; the predicate
    inside `when` still prunes parquet row groups via min/max stats when
    used as a filter variant.
    """
    floor = CFG.min_elevation if min_value is None else min_value
    return df.withColumn(
        value, F.when(F.col(value) > F.lit(floor), F.col(value))
    ).withColumn("is_orig_null", F.col(value).isNull())


def crop_with_halo(
    df: DataFrame,
    order: str,
    lo,
    hi,
    halo,
    compute,
) -> DataFrame:
    """Compute-on-crop with correct boundary context.

    Prunes the scan to [lo-halo, hi+halo] (partition/row-group pruning
    still applies — the predicate is a plain range filter), runs
    ``compute``, then exact-crops to [lo, hi].  This is the ordering rule
    the reference encodes by cropping only at write time
    (reference topo.py:138-140, helpers.py:59).
    """
    pruned = df.where(F.col(order).between(F.lit(lo - halo), F.lit(hi + halo)))
    return compute(pruned).where(F.col(order).between(F.lit(lo), F.lit(hi)))
