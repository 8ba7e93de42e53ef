"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` so each task processes whole record batches (the only
sane shape at 100 TB: media bytes never leave the executor, Python sees
them once per batch via Arrow, and the schema is columnar throughout).

The decode step itself is STUBBED: image/audio libs are not in this
container. ``decoder='fake'`` is a deterministic stand-in (hash-derived
feature vector) that keeps the full Spark plumbing — schema,
partitioning, UDF signature, batch shape — real and testable;
``decoder='real'`` raises NotImplementedError where PIL/ffmpeg would be
called.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes | None, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: feature ``d``
    is the mean of payload bytes at positions ``d, d+16, d+32, ...``
    scaled to [0,1] (strided means — simple enough that the DuckDB
    oracle reproduces it exactly from the same bytes). Replace with a
    real decoder (PIL / torchaudio / ffmpeg frame sampling) in
    production."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
    return np.array(
        [
            arr[d::FEATURE_DIM].mean() if d < len(arr) else 0.0
            for d in range(FEATURE_DIM)
        ]
    ) / 255.0


def decode_media_batch(
    it: Iterator[pd.DataFrame], decoder: str = "fake"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, kind, payload, meta) batches ->
    (media_id, kind, n_bytes, features array<double>)."""
    for pdf in it:
        if decoder == "real":
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg — not in this "
                "container; use decoder='fake' for plumbing tests"
            )
        feats = [
            _fake_decode(p, k).tolist()
            for p, k in zip(pdf["payload"], pdf["kind"])
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                "features": feats,
            }
        )


def media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Distributed decode/feature-extract over a media table."""

    def _kernel(it):
        yield from decode_media_batch(it, decoder=decoder)

    return media.mapInPandas(
        _kernel,
        schema="media_id long, kind string, n_bytes long, features array<double>",
    )


def media_feature_rows(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """:func:`media_features` exploded to one row per feature dimension:
    (media_id, kind, n_bytes, dim, value) with ``value`` rounded to 6
    decimals. The scalar-per-row shape is sortable/hashable — the form
    an oracle (or a downstream join) consumes; the array form stays the
    storage/API shape."""
    feats = media_features(media, decoder=decoder)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("dim", "value"),
    ).select(
        "media_id", "kind", "n_bytes", "dim", F.round("value", 6).alias("value")
    )


def media_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table derived from a documents table: the
    UTF-8 bytes of ``text`` play the opaque payload (kind cycles
    image/audio/video by id). Lets the full binary-column pipeline run
    against parquet-backed data that an external SQL oracle can also
    reach — the real-world analog is a (media_id, payload) table where
    payload came from object storage."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(
            np.uint8
        ).tobytes()
        meta = (
            int(rng.integers(16, 1024)),
            int(rng.integers(16, 1024)),
            16000 if kind == "audio" else None,
            int(rng.integers(1, 300)) if kind == "video" else None,
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
