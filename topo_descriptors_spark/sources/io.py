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


ZORDER_BITS = 12  # 4096 buckets per dimension — plenty for file-level stats


def zorder_col(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Morton (Z-order) curve value over 2+ numeric columns, pure JVM
    expressions: each column is linearly bucketed into ``2^bits`` bins
    between its min and max (one tiny scalar aggregate, broadcast back),
    then the bucket ids' bits are interleaved.  Sorting by the result
    places rows close in EVERY dimension into the same files, so
    parquet min/max footer stats prune scans filtered on ANY of the
    columns — lexicographic sort only ever prunes the leading one.

    Returns ``(df_with_stats, zcol)``; NULLs in any dimension sort
    first (bucket 0).  Linear binning assumes roughly bounded ranges
    (fine for ids/timestamps/coords); for heavy-tailed columns bucket a
    rank or log transform instead.
    """
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns; use cluster_by for 1")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_zmin_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_zmax_{c}") for c in cols],
    )
    d = df.crossJoin(F.broadcast(stats))
    n = len(cols)
    buckets = []
    hi = (1 << bits) - 1
    for c in cols:
        span = F.col(f"_zmax_{c}") - F.col(f"_zmin_{c}")
        frac = F.when(
            span > 0, (F.col(c).cast("double") - F.col(f"_zmin_{c}")) / span
        ).otherwise(F.lit(0.0))
        b = F.least(
            F.lit(hi),
            F.greatest(F.lit(0), F.floor(frac * (1 << bits)).cast("long")),
        )
        buckets.append(F.coalesce(b, F.lit(0)))
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return d, z


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Table sink.  ``cluster_by`` range-partitions the data on those
    columns and sorts within each output file, so each file covers a
    narrow, non-overlapping key range — parquet min/max footer stats
    then let later range/equality scans SKIP whole files (the poor
    man's clustering an Iceberg sort-order would give).  ``zorder_by``
    does the same along a Morton curve over MULTIPLE columns (the
    Delta/Iceberg OPTIMIZE ZORDER analog): files stay narrow in every
    listed dimension, so filters on any one of them skip files —
    mutually exclusive with ``cluster_by``.  ``n_files`` bounds the
    file count for either clustered layout."""
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    if zorder_by:
        d, z = zorder_col(df, zorder_by)
        d = d.withColumn("_zval", z)
        if n_files:
            d = d.repartitionByRange(int(n_files), F.col("_zval"))
        else:
            d = d.repartitionByRange(F.col("_zval"))
        df = d.sortWithinPartitions("_zval").drop(
            "_zval", *[f"_zmin_{c}" for c in zorder_by],
            *[f"_zmax_{c}" for c in zorder_by],
        )
    elif cluster_by:
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
