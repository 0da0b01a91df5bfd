"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed batch-wise via Arrow (mapInPandas).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, or NotImplementedError when a real codec is
demanded) — but everything Spark-side is real and tested: the schema, the
binary column plumbing, the Arrow batch shape, the partition-parallel UDF
signature, and the chunking math that keeps each Arrow batch memory-bounded.

At 100 TB the pattern is: binary payloads live in parquet alongside typed
metadata columns; filters/pruning run on metadata (never deserializing
payloads); only the surviving rows' payloads cross into Python, in bounded
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8
CHUNK_BYTES = 256

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata (the on-disk
    multimodal layout: payload blob + pruning-friendly metadata)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        F.ceil(F.length(payload) / F.lit(CHUNK_BYTES)).cast("long").alias("n_chunks"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: md5-derived unit features.

    Replace with a real decoder (PIL/librosa/ffmpeg) where available; the
    Spark-side contract (bytes in, fixed-dim float vector out) is identical.
    """
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_features(
    media: DataFrame,
    payload_col: str = "payload",
    real_codec: bool = False,
) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    ``mapInPandas`` streams bounded Arrow batches through Python — the only
    non-JVM hop in the multimodal path, vectorized per batch rather than
    per row.
    """
    if real_codec:
        raise NotImplementedError(
            "no image/audio codecs in this environment — plug a decoder into "
            "_fake_decode and pass real_codec=False semantics through"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(_fake_decode),
                }
            )

    return media.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 4,
    payload_col: str = "payload",
    real_codec: bool = False,
) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    frame, via ``mapInPandas`` (a 1→N exploding Arrow transform).

    The "video" is modeled as fixed-size chunks of the payload (a real
    ffmpeg-backed decoder slots into ``_frames``; the Spark contract —
    bytes in, (index, frame bytes) rows out — is identical). Sampling
    every ``every_n``-th frame bounds the output to payload_size/(chunk·n)
    rows per document; the transform is scan-parallel, stateless, and
    never holds more than one Arrow batch of frames in memory.
    """
    if real_codec:
        raise NotImplementedError(
            "no video codecs in this environment — plug a frame decoder "
            "into _frames; the mapInPandas plumbing is codec-agnostic"
        )

    def _frames(payload: bytes) -> list[tuple[int, bytes]]:
        chunks = [
            payload[i : i + CHUNK_BYTES]
            for i in range(0, max(len(payload), 1), CHUNK_BYTES)
        ]
        return [(i, c) for i, c in enumerate(chunks) if i % every_n == 0]

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "frame_bytes": [],
                "frame_hash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                for idx, frame in _frames(bytes(payload)):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(idx)
                    out["frame_bytes"].append(frame)
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    from ..operators.partitioning import repartition_for_compute

    # a single parquet file arrives as ONE partition, which would serialize
    # the whole Python decode on one core — spread it first
    return repartition_for_compute(media).mapInPandas(
        explode_frames, FRAME_SAMPLE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    bytes_per_pixel: int = 1,
    payload_col: str = "payload",
    real_codec: bool = False,
) -> DataFrame:
    """Resize plumbing for image-like payloads via ``mapInPandas``.

    The codec is stubbed (no image libs in this container): the "resize"
    deterministically resamples the payload bytes to exactly
    width·height·bytes_per_pixel output bytes by nearest-neighbor index
    mapping — the same shape contract as a real `PIL.Image.resize`
    (bytes in → fixed-size bytes out), so swapping in a real decoder
    changes one function, not the Spark plan, schema, or batch shape.
    """
    if real_codec:
        raise NotImplementedError(
            "no image codecs in this environment — plug PIL/opencv into "
            "_resample; the mapInPandas plumbing is codec-agnostic"
        )
    out_len = width * height * bytes_per_pixel

    def _resample(payload: bytes) -> bytes:
        if not payload:
            return bytes(out_len)
        n = len(payload)
        # nearest-neighbor index map, the 1-D analogue of NN image scaling
        return bytes(payload[(i * n) // out_len] for i in range(out_len))

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resample(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "n_bytes_out": [len(r) for r in resized],
                }
            )

    from ..operators.partitioning import repartition_for_compute

    return repartition_for_compute(media).mapInPandas(do_resize, RESIZE_SCHEMA)
