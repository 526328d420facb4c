"""topo_descriptors_spark — a PySpark-native feature-engineering engine.

A from-scratch re-expression of the data-processing capabilities of
MeteoSwiss/topo-descriptors (reference at /root/reference, BSD-3) as a
point-in-time / as-of-join + windowed feature engine over long-format
tables of pre-tokenized sequences, per SURVEY.md.

The reference computes multiscale windowed kernels (TPI, rolling std,
Gaussian smoothing, gradient/slope/aspect, valley/ridge index, Sx wind
shelter) over a dense 2-D grid (reference topo.py).  This engine recasts
each descriptor as either

* a bounded Spark SQL window frame over ``(entity_id, pos/ts)``
  (the 1-D sequence form — pure JVM-side expressions, no Python in the
  hot path), or
* a halo-padded tile partition processed by a vectorized numpy kernel
  via ``groupBy(tile).applyInPandas`` (the 2-D grid form — Arrow
  batches, never per-row Python),

plus the relational operators a 10^12-row training-data pipeline needs:
salted sort-merge as-of joins, dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search, text analysis, checkpoint/resume.
"""

from topo_descriptors_spark.config import CFG, EngineConfig
from topo_descriptors_spark.session import get_spark

__all__ = ["CFG", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
