"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` kernels.

Decode paths:
- REAL (``decode_image_real`` → ``decode_features_real``): pure-stdlib
  decoders for BMP (24-bit BI_RGB), PPM (P6), and PNG (8-bit
  gray/RGB/RGBA, all five scanline filters, zlib IDAT) — no external
  codec needed, pixels actually recovered. Formats that genuinely need
  a codec (JPEG/WebP/video) still raise NotImplementedError behind the
  guard; swapping in PIL/ffmpeg changes one function.
- FAKE (``decode_image_fake``): deterministic byte-level stand-in used
  by the registry query over the synthetic text-blob corpus.

Scale notes: binary payloads stay in executor-side Arrow batches
(never collected); per-batch model/codec init happens once per
iterator (the ``mapInPandas`` generator prologue), mirroring
per-worker model load (reference modal/transcribe.py:22-28's
@modal.enter pattern — re-expressed, not ported).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
        # Spark-compatible XXH64 (seed 42) of the frame bytes: the
        # fingerprint an oracle can replay over a byte-list slice
        # (oracle_bits emitters), unlike md5-of-arbitrary-bytes which
        # DuckDB only exposes for VARCHAR.
        T.StructField("frame_xxh64", T.LongType()),
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 24-bit BI_RGB Windows bitmap → (w, h, 3, RGB rows
    top-down). BMP stores BGR bottom-up with rows padded to 4 bytes."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    bottom_up = h > 0
    h = abs(h)
    row_size = ((w * 3 + 3) // 4) * 4
    px = bytearray(w * h * 3)
    for y in range(h):
        src = data_off + (h - 1 - y if bottom_up else y) * row_size
        for x in range(w):
            b, g, r = blob[src + 3 * x : src + 3 * x + 3]
            i = (y * w + x) * 3
            px[i] = r
            px[i + 1] = g
            px[i + 2] = b
    return w, h, 3, bytes(px)


def _decode_ppm(blob: bytes) -> tuple[int, int, int, bytes]:
    """Binary PPM (P6, maxval 255) → (w, h, 3, RGB rows top-down)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(blob[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from data
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval={maxval}")
    need = w * h * 3
    px = blob[pos : pos + need]
    if len(px) != need:
        raise ValueError("truncated PPM pixel data")
    return w, h, 3, px


def _decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """PNG, 8-bit depth, gray/RGB/RGBA (color types 0/2/6), no
    interlace → (w, h, channels, unfiltered rows top-down). Inflates
    the IDAT stream with stdlib zlib and inverts all five scanline
    filters (none/sub/up/average/paeth)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = channels = None
    while pos + 8 <= len(blob):
        ln = struct.unpack_from(">I", blob, pos)[0]
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (0, 2, 6) or inter != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={ctype} interlace={inter}"
                )
            channels = {0: 1, 2: 3, 6: 4}[ctype]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * channels
    ch = channels
    px = bytearray(stride * h)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        px[y * stride : (y + 1) * stride] = row
        prev = row
    return w, h, channels, bytes(px)


def decode_image_real(blob: bytes, fmt: str | None = None) -> tuple[int, int, int, bytes]:
    """Real decode: sniff the container by magic bytes and recover
    actual pixels → (width, height, channels, pixel bytes — rows
    top-down). BMP/PPM/PNG decode with the stdlib alone; JPEG/WebP
    (and anything else) still need a codec this container lacks and
    raise NotImplementedError — the declared swap-in point for a
    PIL/ffmpeg kernel."""
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] == b"P6":
        return _decode_ppm(blob)
    if blob[:3] == b"\xff\xd8\xff" or blob[8:12] == b"WEBP":
        raise NotImplementedError(
            f"{fmt or 'jpeg/webp'} needs an image codec not present in "
            "this environment"
        )
    raise ValueError(f"unrecognized image container (fmt hint: {fmt!r})")


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


def synthetic_pixels(doc_id: int, w: int, h: int, ch: int = 3) -> bytes:
    """Deterministic pixel pattern, a pure function of (doc_id, x, y,
    c) — the oracle recomputes the same values in SQL, so a container
    round-trip (encode → real decode → features) is hash-checkable."""
    return bytes(
        (x * 7 + y * 31 + c * 101 + doc_id) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) encoder — the uncompressed container used to
    exercise the real decoder inside a registry query."""
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


REAL_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("pixel_checksum", T.StringType()),
    ]
)


def encode_synthetic_ppm(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): each doc gets a real PPM container
    holding its synthetic_pixels pattern (dims derived from doc_id).
    Paired with decode_features_real this round-trips actual pixels
    through a real container inside the engine."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 8 + i % 9, 6 + i % 5
                blobs.append(encode_ppm(w, h, synthetic_pixels(i, w, h)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def decode_features_real(blobs: DataFrame) -> DataFrame:
    """mapInPandas kernel over REAL image containers: each blob is
    decoded to pixels (decode_image_real) and reduced to features —
    dimensions, channel count, mean pixel value, md5 of the decoded
    pixel buffer. Input: (doc_id, blob). Same Arrow-batched shape as
    the fake-path kernel; only the per-blob function differs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in REAL_DECODED_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, ch, px = decode_image_real(bytes(blob))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["mean_pixel"].append(
                    round(sum(px) / len(px), 6) if px else 0.0
                )
                out["pixel_checksum"].append(hashlib.md5(px).hexdigest())
            yield pd.DataFrame(out)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, REAL_DECODED_SCHEMA)


WAV_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("pcm_checksum", T.StringType()),
    ]
)


def synthetic_pcm(doc_id: int, n: int) -> list[int]:
    """Deterministic int16 sample pattern — a pure function of
    (doc_id, i) the oracle recomputes in SQL."""
    return [((doc_id * 31 + i * 7) % 2048) - 1024 for i in range(n)]


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Canonical RIFF/WAVE PCM16 encoder (44-byte header + LE data) —
    the uncompressed audio container, stdlib-only."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate,
            sample_rate * channels * 2, channels * 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    ) + data


def decode_wav(blob: bytes) -> tuple[int, int, bytes]:
    """REAL RIFF/WAVE parser: validates the container magic, walks the
    chunk list (tolerating extra chunks), and returns (channels,
    sample_rate, pcm_data) for PCM16. Raises on anything else — the
    compressed-codec guard, like the image decoder's."""
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1:
                raise NotImplementedError(
                    f"compressed WAV (format {fmt_tag}) needs a codec"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM unsupported (PCM16 only)")
    return channels, rate, data


def encode_synthetic_wav(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): a real PCM16 WAV per doc, length and
    rate derived from doc_id, samples from synthetic_pcm."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 64 + i % 129
                rate = 8000 + (i % 3) * 4000
                blobs.append(encode_wav(rate, synthetic_pcm(i, n)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(kernel, "doc_id long, blob binary")


def decode_wav_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas kernel over REAL WAV containers: parse the RIFF
    chunks, decode int16 PCM, reduce to integer-exact features
    (duration, energy, mean-abs) + an md5 over the PCM hex — every
    output integer/string, so the oracle replay is bit-exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in WAV_DECODED_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                _ch, rate, data = decode_wav(bytes(blob))
                n = len(data) // 2
                smp = struct.unpack(f"<{n}h", data)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["sum_sq"].append(sum(s * s for s in smp))
                out["sum_abs"].append(sum(abs(s) for s in smp))
                out["pcm_checksum"].append(
                    hashlib.md5(data.hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, WAV_DECODED_SCHEMA)


RVID_MAGIC = b"RVID"

RVID_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_px", T.LongType()),
        T.StructField("px_checksum", T.StringType()),
    ]
)


def synthetic_frame(doc_id: int, f: int, w: int, h: int, ch: int = 3) -> bytes:
    """Per-frame deterministic pixels: synthetic_pixels' pattern plus a
    13·frame phase — pure function of (doc_id, f, x, y, c)."""
    return bytes(
        (x * 7 + y * 31 + c * 101 + doc_id + f * 13) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def encode_rvid(w: int, h: int, fps: int, frames: list[bytes]) -> bytes:
    """Raw-video container: RVID magic + (w, h, fps, n_frames) header +
    concatenated raw RGB frames — the uncompressed stand-in container
    (an MP4/H.264 parse needs a codec; the guard raises on it)."""
    import struct

    body = b"".join(frames)
    return RVID_MAGIC + struct.pack("<HHHH", w, h, fps, len(frames)) + body


def decode_rvid(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """REAL container parse: validate magic, read the header, check
    the payload length, split exact frames."""
    import struct

    if blob[:4] != RVID_MAGIC:
        raise NotImplementedError(
            "not an RVID container — compressed video needs a codec"
        )
    w, h, fps, n = struct.unpack("<HHHH", blob[4:12])
    fsize = w * h * 3
    body = blob[12:]
    if len(body) != fsize * n:
        raise ValueError(f"payload {len(body)} != {n} frames × {fsize}")
    return w, h, fps, [body[i * fsize : (i + 1) * fsize] for i in range(n)]


def encode_synthetic_rvid(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): a real RVID container per doc, dims /
    fps / frame count derived from doc_id."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, fps, n = 6 + i % 5, 4 + i % 3, 10 + i % 5, 3 + i % 4
                frames = [synthetic_frame(i, f, w, h) for f in range(n)]
                blobs.append(encode_rvid(w, h, fps, frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(kernel, "doc_id long, blob binary")


def decode_rvid_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas kernel over RVID containers → one row per frame:
    dims, fps, container duration, per-frame integer pixel sum and an
    md5 over the frame's hex — all integer/string outputs so the
    oracle replay is bit-exact. At 100 TB frames explode map-side and
    only (id, idx, features) rows ever shuffle — blobs stay put."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in RVID_DECODED_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, fps, frames = decode_rvid(bytes(blob))
                dur = len(frames) * 1000 // fps
                for f_idx, frame in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f_idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(fps)
                    out["duration_ms"].append(dur)
                    out["sum_px"].append(sum(frame))
                    out["px_checksum"].append(
                        hashlib.md5(frame.hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return blobs.select("doc_id", "blob").mapInPandas(kernel, RVID_DECODED_SCHEMA)


def sample_frames(multimodal: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: split each blob into n byte-range
    'frames' (the video-keyframe access pattern), one output row per
    frame — a mapInPandas flat-map (output rows ≠ input rows)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from firefly_vcut_spark.oracle_bits import (
            SPARK_HASH_SEED,
            to_signed64,
            xxh64_bytes,
        )

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
                    out["frame_xxh64"].append(
                        to_signed64(xxh64_bytes(frame, SPARK_HASH_SEED))
                    )
            yield pd.DataFrame(out)

    return multimodal.select("doc_id", "blob").mapInPandas(kernel, FRAME_SCHEMA)
