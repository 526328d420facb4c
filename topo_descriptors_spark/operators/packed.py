"""Packed-sequence feature engine: per-document descriptors computed
directly from the ``tokens array<int>`` column — ZERO shuffle.

The exploded path (operators/window.py) is the general engine: explode
to (doc, pos) rows, one WindowExec, as-of join.  But when (a) sequences
are stored packed (one array per row — exactly the input_hint shape) and
(b) every feature frame is bounded WITHIN the document, the whole
pipeline is row-contained: no repartition, no sort, no join.  This
module computes the same multiscale TPI / rolling std / Gaussian MA /
Sx features and the same point-in-time gather with one ``mapInPandas``
pass — each Arrow batch is processed with whole-batch numpy (docs are
concatenated and handled with offset arithmetic, NOT a per-doc Python
loop):

* TPI/std: global cumsum + per-position frame bounds clamped to the
  document's [start, end) — O(1) per position.
* Gaussian MA: ONE convolution over the batch concatenation with
  radius-sized zero gaps between docs; the presence-mask convolution
  renormalizes edges exactly like the lag-bank form (and the gap zeros
  keep documents from leaking into each other).
* Sx: shifted-array max over backward offsets, masked to own-doc reach.
* PIT gather: query positions index straight into the concatenation.

Identical results to explode -> multiscale_features -> sx_1d ->
asof_join at matching positions (pinned in tests/test_packed.py).  At
10^12 sequences this is the plan that wins: the exploded form shuffles
and sorts n_docs x seq_len rows; this form moves nothing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from topo_descriptors_spark.functions.planner import (
    frame_half_width,
    gaussian_weights,
)
from topo_descriptors_spark.functions.validate import require_cols


def _sig_name(s: float) -> str:
    return f"smooth_{str(s).replace('.', 'p')}"


def packed_features_at(
    df: DataFrame,
    scales_pxl: list[int],
    sigmas: list[float] | None = None,
    tokens: str = "tokens",
    positions: str = "q_positions",
    keep_cols: tuple[str, ...] = ("doc_key",),
    sx_radius_steps: int | None = None,
    sx_radius_min_steps: int = 1,
    sx_height: float = 0.0,
    sx_step_meters: float = 1.0,
) -> DataFrame:
    """Multiscale features evaluated at per-doc query ``positions``
    (array<long> column): emits one row per (doc, query position) with
    ``pos`` and every feature column — the fused, shuffle-free form of
    explode + window features (+ Sx) + as-of-at-existing-positions.
    """
    require_cols(df, "packed_features_at",
                 **{tokens: "array_numeric", positions: "array_numeric"})
    sigmas = list(sigmas or [])
    banks = {s: np.asarray(gaussian_weights(s), dtype=np.float64) for s in sigmas}
    gap = max((len(w) // 2 for w in banks.values()), default=0)
    feat_names = (
        [f"tpi_{d}" for d in scales_pxl]
        + [f"std_{d}" for d in scales_pxl]
        + [_sig_name(s) for s in sigmas]
        + (["sx"] if sx_radius_steps else [])
    )
    schema = StructType(
        [df.schema[c] for c in keep_cols]
        + [StructField("pos", LongType()), StructField("value", DoubleType())]
        + [StructField(n, DoubleType()) for n in feat_names]
    )
    ks = {d: frame_half_width(d) for d in scales_pxl}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({f.name: pd.Series(dtype="object")
                                    for f in schema.fields})
                continue
            tok_arrays = [np.asarray(t, dtype=np.float64)
                          for t in pdf[tokens]]
            lens = np.array([len(t) for t in tok_arrays], dtype=np.int64)
            v = np.concatenate(tok_arrays) if len(tok_arrays) else np.empty(0)
            offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            total = int(lens.sum())
            doc_of = np.repeat(np.arange(len(lens)), lens)
            start_of = offsets[doc_of]
            end_of = start_of + lens[doc_of]
            idx = np.arange(total, dtype=np.int64)

            feats: dict[str, np.ndarray] = {}
            if scales_pxl:
                cs = np.concatenate([[0.0], np.cumsum(v)])
                css = np.concatenate([[0.0], np.cumsum(v * v)])
                with np.errstate(divide="ignore", invalid="ignore"):
                    for d in scales_pxl:
                        k = ks[d]
                        lo = np.maximum(start_of, idx - k)
                        hi = np.minimum(end_of, idx + k + 1)
                        s = cs[hi] - cs[lo]
                        ss = css[hi] - css[lo]
                        c = (hi - lo).astype(np.float64)
                        feats[f"tpi_{d}"] = v - (s - v) / (c - 1.0)
                        var = (ss - s * s / c) / (c - 1.0)
                        feats[f"std_{d}"] = np.sqrt(np.clip(var, 0.0, None))

            if banks:
                # one padded concatenation serves every sigma: gap zeros
                # (mask 0) isolate documents up to the largest radius
                plen = total + gap * len(lens)
                pv = np.zeros(plen, dtype=np.float64)
                mask = np.zeros(plen, dtype=np.float64)
                pidx = idx + gap * doc_of
                pv[pidx] = v
                mask[pidx] = 1.0
                for s_, bank in banks.items():
                    r = len(bank) // 2
                    num = np.convolve(pv, bank, mode="full")[r : r + plen]
                    den = np.convolve(mask, bank, mode="full")[r : r + plen]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        feats[_sig_name(s_)] = (num / den)[pidx]

            if sx_radius_steps:
                sx = np.full(total, np.nan)
                for k in range(sx_radius_min_steps, sx_radius_steps + 1):
                    reach = idx - start_of >= k
                    prev = np.empty(total)
                    prev[reach] = v[idx[reach] - k]
                    ang = np.degrees(np.arctan(
                        (prev - v - sx_height) / (k * sx_step_meters)
                    ))
                    upd = reach & (np.isnan(sx) | (ang > sx))
                    sx[upd] = ang[upd]
                feats["sx"] = sx

            q_arrays = [np.asarray(q, dtype=np.int64) for q in pdf[positions]]
            q_lens = np.array([len(q) for q in q_arrays], dtype=np.int64)
            q_doc = np.repeat(np.arange(len(lens)), q_lens)
            q_pos = (np.concatenate(q_arrays) if len(q_arrays)
                     else np.empty(0, dtype=np.int64))
            # bounds check BEFORE the gather: a position outside the
            # doc's token range would otherwise silently read the NEXT
            # document's values (cross-doc leak) for interior docs
            bad = (q_pos < 0) | (q_pos >= lens[q_doc])
            if bad.any():
                j = int(np.argmax(bad))
                row = int(q_doc[j])
                doc = (pdf[keep_cols[0]].iloc[row]
                       if keep_cols else f"batch row {row}")
                raise ValueError(
                    "packed_features_at: query position out of range — "
                    f"doc {doc!r} (len {int(lens[row])}) has query "
                    f"position {int(q_pos[j])}"
                )
            g = offsets[q_doc] + q_pos  # global gather index

            out = {c: pdf[c].to_numpy()[q_doc] for c in keep_cols}
            out["pos"] = q_pos
            out["value"] = v[g]
            for n in feat_names:
                out[n] = feats[n][g]
            yield pd.DataFrame(out)

    cols = list(dict.fromkeys([*keep_cols, tokens, positions]))
    return df.select(*cols).mapInPandas(run, schema)


def deterministic_query_positions(
    df: DataFrame,
    n_queries: int = 8,
    id_col: str = "doc_key",
    len_col: str = "n_tok",
    out: str = "q_positions",
) -> DataFrame:
    """The flagship's PIT query set as a packed column: n_queries
    deterministic positions per doc (xxhash64(doc, i) mod len) — the
    packed twin of the exploded query generator in bench.py."""
    qi = F.sequence(F.lit(0), F.lit(int(n_queries) - 1))
    return df.withColumn(
        out,
        F.transform(
            qi, lambda i: F.pmod(F.xxhash64(F.col(id_col), i),
                                 F.col(len_col)).cast("long")
        ),
    )
