"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extract / frame-sample plumbing.

Image/audio/video payloads are carried as ``binary`` columns with a
``kind`` discriminator and a metadata map — the storage pattern for
multimodal training data at lake scale (payload stays columnar, metadata
prunable).  The real codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is STUBBED: :func:`decode_stub` raises
``NotImplementedError`` where a real decoder would plug in, and the
shipped kernels use a deterministic fake (byte-histogram features,
chunk-hash frame samples) so the Spark-side plumbing — schema,
partition-preserving ``mapInPandas``, Arrow batch shapes, null handling —
is real and tested end-to-end.

Everything is ``mapInPandas`` (vectorized over Arrow record batches):
no shuffle, no per-row Python function calls from the JVM.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_FEATURES = 16  # byte-histogram bins of the deterministic fake extractor

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", StringType()),  # binary in to_media; stub here
    ]
)


def attach_fake_media(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary payload column from existing data —
    the stand-in for reading real media bytes from the lake.  The kind
    discriminator uses the PORTABLE md5 hash (not xxhash64) so the
    driver-gate oracle can reproduce the kind assignment in SQL."""
    from topo_descriptors_spark.operators.text import PORTABLE_HASH_SQL

    h = PORTABLE_HASH_SQL.format(col=f"cast({id_col} as string)")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.expr(f"{h} % 3") + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        kind.alias("kind"),
        F.col(text).cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.lit("synthetic"),
            F.lit("bytes"), F.length(F.col(text)).cast("string"),
        ).alias("meta"),
    )


def decode_stub(kind: str, payload: bytes):
    """Where a real decoder would plug in.

    A production build would dispatch to PIL (image), soundfile (audio)
    or pyav (video) here; none are available in this container.
    """
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "use the deterministic fake extractors instead"
    )


def _byte_histogram(payload: bytes, bins: int = N_FEATURES) -> np.ndarray:
    """Deterministic fake 'embedding': normalized histogram of bytes."""
    if payload is None or len(payload) == 0:
        return np.zeros(bins, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr // (256 // bins), minlength=bins).astype(np.float64)
    return hist / hist.sum()


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Vectorized feature extraction over Arrow batches (mapInPandas):
    one numpy pass per batch, no shuffle, schema fixed up front."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                _byte_histogram(p if p is not None else b"").tolist()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in payloads],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", LongType()),
        StructField("frame_features", ArrayType(DoubleType())),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: split the payload into
    ``n_frames`` chunks (the deterministic fake of time-uniform frame
    extraction) and emit per-frame features — a row-expanding
    mapInPandas, the same shape a real ffmpeg-based sampler would have."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_hash, out_feat = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None or len(payload) == 0:
                    continue
                chunks = np.array_split(
                    np.frombuffer(payload, dtype=np.uint8), n_frames
                )
                for i, ch in enumerate(chunks):
                    out_id.append(mid)
                    out_idx.append(i)
                    # zlib.crc32: deterministic across processes (Python's
                    # builtin hash() of bytes is salted per process)
                    out_hash.append(int(zlib.crc32(ch.tobytes())))
                    out_feat.append(_byte_histogram(ch.tobytes()).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="object"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_hash": pd.Series(out_hash, dtype="int64"),
                    # object dtype even when empty: an empty plain list
                    # infers float64 and breaks Arrow's list<double> path
                    "frame_features": pd.Series(out_feat, dtype="object"),
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
