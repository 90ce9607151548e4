"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` kernels.

The container has no image/audio codecs, so the *decode* step is
stubbed (SURVEY-mandated): ``decode_image_real`` raises
NotImplementedError behind an import-try, and ``decode_image_fake``
is a deterministic byte-level stand-in. Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested; swapping the fake for a PIL/ffmpeg kernel changes one
function.

Scale notes: binary payloads stay in executor-side Arrow batches
(never collected); per-batch model/codec init happens once per
iterator (the ``mapInPandas`` generator prologue), mirroring
per-worker model load (reference modal/transcribe.py:22-28's
@modal.enter pattern — re-expressed, not ported).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def attach_fake_blobs(docs: DataFrame) -> DataFrame:
    """Turn documents into a multimodal table: text bytes as the blob
    (deterministic stand-in for image payloads) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            (64 + F.col("doc_id") % 193).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 7) % 129).cast("int").alias("height"),
            F.element_at(
                F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("format"),
        ).alias("meta"),
    )


def decode_image_real(blob: bytes, fmt: str):  # pragma: no cover
    """Real decode path — requires an image codec not present in this
    container. Kept as the swap-in point for production."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use decode_image_fake for deterministic tests"
        ) from e
    raise NotImplementedError("real decode wiring lands with the codec")


def decode_image_fake(blob: bytes) -> tuple[str, float]:
    """Deterministic stand-in for decode+feature-extract: content
    checksum + mean byte value (the 'pixel statistics')."""
    md5 = hashlib.md5(blob).hexdigest()
    mean = (sum(blob) / len(blob)) if blob else 0.0
    return md5, mean


def decode_features(multimodal: DataFrame) -> DataFrame:
    """mapInPandas kernel: blob → (checksum, mean_byte) features,
    carrying the metadata struct through. Arrow-batched; one kernel
    init per partition iterator."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens here (codec/model load in prod)
        for pdf in batches:
            checksums, means = [], []
            for blob in pdf["blob"]:
                b = bytes(blob)
                md5, mean = decode_image_fake(b)
                checksums.append(md5)
                means.append(mean)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(b)) for b in pdf["blob"]],
                    "checksum": checksums,
                    "mean_byte": means,
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    flat = multimodal.select(
        "doc_id", "blob", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return flat.mapInPandas(kernel, DECODED_SCHEMA)


def sample_frames(multimodal: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: split each blob into n byte-range
    'frames' (the video-keyframe access pattern), one output row per
    frame — a mapInPandas flat-map (output rows ≠ input rows)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    frame = b[i * step : (i + 1) * step]
                    if not frame:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_checksum"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return multimodal.select("doc_id", "blob").mapInPandas(kernel, FRAME_SCHEMA)
