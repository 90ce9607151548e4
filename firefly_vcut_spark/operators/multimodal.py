"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` kernels.

Decode paths:
- REAL (``decode_image_real`` → ``decode_features_real``): from-scratch
  decoders for BMP (24-bit BI_RGB), PPM (P6), PNG (all five color
  types, bit depths 1/2/4/8/16, PLTE/tRNS, Adam7 interlace, all five
  scanline filters, zlib IDAT), JPEG (baseline SOF0/1 incl.
  multi-scan and DRI/RST restarts, progressive SOF2 per T.81 Annex G,
  sampling factors to 2x2), GIF (variable-width LZW, interlace,
  transparency composition), and baseline TIFF (II/MM, strips,
  gray/RGB/palette, LZW with early change + predictor 2, PackBits)
  — no external codec needed, pixels
  actually recovered. WebP-LOSSLESS (VP8L) also decodes natively
  (operators/webp.py, r8: prefix codes, LZ77 + distance map, color
  cache, meta-prefix, all four transforms). The remaining codec-class
  boundary (WebP's lossy VP8, inter-coded video,
  arithmetic/hierarchical JPEG) raises NotImplementedError behind the
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


# Adam7 interlace passes: (xstart, ystart, xstep, ystep)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# spec-legal (color type → allowed bit depths)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}


def _png_unfilter(raw: bytes, p: int, stride: int, bpp: int, nrows: int):
    """Invert the five scanline filters over one (sub)image; returns
    (rows, next offset). ``bpp`` is the filter byte distance — whole
    bytes per pixel, min 1 for sub-byte depths per spec."""
    rows = []
    prev = bytearray(stride)
    for _ in range(nrows):
        f = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif f == 2:  # up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        rows.append(row)
        prev = row
    return rows, p


def _png_row_samples(row: bytes, sw: int, ch_raw: int, depth: int) -> list[int]:
    """One unfiltered scanline → flat per-channel samples (MSB-first
    bit unpacking for sub-byte depths, big-endian pairs for 16-bit)."""
    n = sw * ch_raw
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return [
            (row[2 * i] << 8) | row[2 * i + 1] for i in range(n)
        ]
    out = []
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    for i in range(n):
        byte = row[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append((byte >> shift) & mask)
    return out


def _decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """PNG → (w, h, channels, rows top-down): all five color types
    (gray, RGB, palette, gray+alpha, RGBA), bit depths 1/2/4/8/16
    (sub-byte depths scaled to 8-bit, 16-bit reduced to the high
    byte), PLTE + tRNS palette transparency, and Adam7 interlace.
    Inflates IDAT with stdlib zlib and inverts all five scanline
    filters (none/sub/up/average/paeth) per pass."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = depth = ctype = inter = None
    plte: bytes = b""
    trns: bytes = b""
    while pos + 8 <= len(blob):
        ln = struct.unpack_from(">I", blob, pos)[0]
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if ctype not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(f"PNG depth={depth} color_type={ctype} invalid")
            if inter not in (0, 1):
                raise ValueError(f"PNG interlace={inter} invalid")
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if ctype == 3 and not plte:
        raise ValueError("palette PNG missing PLTE")
    ch_raw = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    bpp = max(1, (ch_raw * depth) // 8)

    # samples grid: h rows × (w * ch_raw) ints
    grid = [[0] * (w * ch_raw) for _ in range(h)]
    p = 0
    if inter == 0:
        stride = (w * ch_raw * depth + 7) // 8
        rows, p = _png_unfilter(raw, p, stride, bpp, h)
        for y, row in enumerate(rows):
            grid[y] = _png_row_samples(row, w, ch_raw, depth)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sw = (w - x0 + dx - 1) // dx
            sh = (h - y0 + dy - 1) // dy
            if sw <= 0 or sh <= 0:
                continue
            stride = (sw * ch_raw * depth + 7) // 8
            rows, p = _png_unfilter(raw, p, stride, bpp, sh)
            for sy, row in enumerate(rows):
                samples = _png_row_samples(row, sw, ch_raw, depth)
                y = y0 + sy * dy
                for sx in range(sw):
                    x = x0 + sx * dx
                    for c in range(ch_raw):
                        grid[y][x * ch_raw + c] = samples[sx * ch_raw + c]

    # map raw samples to 8-bit output pixels
    if ctype == 3:
        n_pal = len(plte) // 3
        has_alpha = len(trns) > 0
        ch_out = 4 if has_alpha else 3
        px = bytearray(w * h * ch_out)
        for y in range(h):
            for x in range(w):
                ci = grid[y][x]
                if ci >= n_pal:
                    raise ValueError("palette index out of range")
                o = (y * w + x) * ch_out
                px[o : o + 3] = plte[3 * ci : 3 * ci + 3]
                if has_alpha:
                    px[o + 3] = trns[ci] if ci < len(trns) else 255
        return w, h, ch_out, bytes(px)
    maxv = (1 << depth) - 1
    ch_out = ch_raw
    px = bytearray(w * h * ch_out)
    o = 0
    for y in range(h):
        row = grid[y]
        for v in row:
            if depth == 8:
                px[o] = v
            elif depth == 16:
                px[o] = v >> 8
            else:
                px[o] = v * 255 // maxv
            o += 1
    return w, h, ch_out, bytes(px)


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): a from-scratch codec so the codec-class
# guard narrows to formats that genuinely need an external library
# (WebP's lossy VP8, video; arithmetic-coded / hierarchical / lossless
# JPEG — WebP-lossless decodes natively via operators/webp.py). The decoder handles any spec-conformant Huffman DCT stream,
# BASELINE (SOF0/1) or PROGRESSIVE (SOF2): DQT (8/16 bit), canonical
# DHT, sampling factors up to 2x2 (chroma upsampled by replication),
# DRI/RSTn restarts, 0xFF00 byte unstuffing, Huffman + extend entropy
# decode — plus, for progressive, spectral-selection band scans,
# successive-approximation refinement (correction bits) and AC EOB
# runs per T.81 Annex G — dequantize, de-zigzag, orthonormal 2-D IDCT
# (numpy), YCbCr->RGB. The encoders emit conformant 4:4:4 baseline
# AND progressive streams with image-derived canonical Huffman tables
# — the fixture generators for the decoder's tests.

# scan position -> natural (row*8+col) block index
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (quality 50) — luma, chroma
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


def _canonical_codes(counts_by_len: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical JPEG Huffman table
    (DHT wire format: 16 length counts + symbols in code order)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts_by_len[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def emit_restart(self, n: int) -> None:
        """Byte-align (1-padding) and append RSTn — raw marker bytes,
        exempt from stuffing by construction."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out.append(0xFF)
        self.out.append(0xD0 + (n & 7))


def _huffman_table_from_freqs(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Build a valid canonical (counts-by-length, symbols) pair for
    DHT from symbol frequencies: package-merge is overkill here — a
    frequency-sorted assignment at a single sufficient code length is
    spec-conformant (canonical codes of equal length), trivially
    length-limited, and keeps the encoder ~50 lines. Length L is the
    smallest with 2**L > n_symbols (strict: the all-ones code of the
    longest length must stay unused per T.81 C.2)."""
    symbols = sorted(freqs, key=lambda s: (-freqs[s], s))
    n = len(symbols)
    ln = 1
    while (1 << ln) <= n:
        ln += 1
    counts = [0] * 16
    counts[ln - 1] = n
    return counts, symbols


def _bit_size(v: int) -> int:
    return v.bit_length() if v > 0 else ((-v).bit_length() if v else 0)


def _rgb_to_quantized_blocks(w: int, h: int, rgb: bytes):
    """Shared encoder front half: RGB → per-component quantized DCT
    blocks (natural order, Annex K tables, 4:4:4). Returns
    (bw, bh, comp_blocks)."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    ycc = np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    )
    bw, bh = (w + 7) // 8, (h + 7) // 8
    T8 = _dct_matrix()
    qt_l = np.array(_QT_LUMA, dtype=np.float64).reshape(8, 8)
    qt_c = np.array(_QT_CHROMA, dtype=np.float64).reshape(8, 8)
    comp_blocks: list[list] = [[], [], []]
    for c in range(3):
        plane = ycc[c]
        padded = np.pad(
            plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
        ) - 128.0
        qt = qt_l if c == 0 else qt_c
        for by in range(bh):
            for bx in range(bw):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = T8 @ blk @ T8.T
                q = np.round(coef / qt).astype(np.int32)
                comp_blocks[c].append(q.reshape(64))
    return bw, bh, comp_blocks


def encode_jpeg_baseline(
    w: int,
    h: int,
    rgb: bytes,
    *,
    restart_interval: int = 0,
    interleave: bool = True,
) -> bytes:
    """RGB top-down rows → baseline sequential JFIF (SOF0, 4:4:4,
    Annex K quant tables, image-derived canonical Huffman tables).
    Lossy like any JPEG; the decoder round-trips it within quant
    error. Fixture generator for ``_decode_jpeg``.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (DC predictors reset), exercising the
    decoder's resync path. ``interleave=False`` emits one
    non-interleaved SOS per component (a spec-legal multi-scan
    baseline stream, T.81 A.2.2) instead of a single interleaved
    scan."""

    bw, bh, comp_blocks = _rgb_to_quantized_blocks(w, h, rgb)

    # one symbol generator drives BOTH the frequency pass and the
    # entropy pass, so the histogram the tables are built from is by
    # construction the symbol stream that gets encoded
    def _block_symbols(zz: list[int], prev: int):
        """Yield ('dc'|'ac', symbol, amplitude, size) for one block
        (zigzag-ordered coefficients), given the DC predictor."""
        diff = zz[0] - prev
        yield ("dc", _bit_size(diff), diff, _bit_size(diff))
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        if last_nz == 0:
            yield ("ac", 0x00, 0, 0)  # EOB
            return
        run = 0
        for i in range(1, 64):
            v = zz[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                yield ("ac", 0xF0, 0, 0)  # ZRL
                run -= 16
            sz = _bit_size(v)
            yield ("ac", (run << 4) | sz, v, sz)
            run = 0
        if last_nz < 63:
            yield ("ac", 0x00, 0, 0)  # EOB

    # scan layout: list of scans, each a list of MCUs, each MCU a
    # list of (component, block-index). 4:4:4 → interleaved MCUs hold
    # one block per component; non-interleaved MCUs are single blocks.
    if interleave:
        scan_layout = [
            ([0, 1, 2], [[(0, bi), (1, bi), (2, bi)] for bi in range(bw * bh)])
        ]
    else:
        scan_layout = [
            ([cix], [[(cix, bi)] for bi in range(bw * bh)])
            for cix in range(3)
        ]

    def _walk(mcus, emit, on_restart=None):
        """Feed one scan's symbols to emit in MCU order, resetting DC
        predictors (and notifying on_restart) at restart intervals —
        the same generator drives the frequency and entropy passes."""
        prev_dc = [0, 0, 0]
        for mi, mcu in enumerate(mcus):
            if restart_interval and mi and mi % restart_interval == 0:
                prev_dc = [0, 0, 0]
                if on_restart is not None:
                    on_restart((mi // restart_interval - 1) & 7)
            for cix, bi in mcu:
                tix = 0 if cix == 0 else 1
                blk = comp_blocks[cix][bi]
                zz = [int(blk[_ZIGZAG[i]]) for i in range(64)]
                for sym in _block_symbols(zz, prev_dc[cix]):
                    emit(tix, sym)
                prev_dc[cix] = zz[0]

    # pass 2: symbol frequencies — shared tables: class 0 = luma
    # (comp 0), class 1 = chroma (comps 1, 2)
    dc_freq: list[dict] = [dict(), dict()]
    ac_freq: list[dict] = [dict(), dict()]

    def _count(tix, sym):
        kind, s, _v, _sz = sym
        tbl = dc_freq[tix] if kind == "dc" else ac_freq[tix]
        tbl[s] = tbl.get(s, 0) + 1

    for _comps_in_scan, mcus in scan_layout:
        _walk(mcus, _count)
    dc_tables = [_huffman_table_from_freqs(f or {0: 1}) for f in dc_freq]
    ac_tables = [_huffman_table_from_freqs(f or {0: 1}) for f in ac_freq]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    # pass 3: per-scan entropy-coded segments
    def _encode_scan(mcus) -> bytes:
        bits = _BitWriter()

        def _emit(tix, sym):
            kind, s, v, sz = sym
            code, ln = (dc_codes if kind == "dc" else ac_codes)[tix][s]
            bits.write(code, ln)
            if sz:
                bits.write(v if v > 0 else v + (1 << sz) - 1, sz)

        _walk(mcus, _emit, on_restart=bits.emit_restart)
        return bits.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[_ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (counts, symbols) in enumerate(tables):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(symbols))
            out += bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for comps_in_scan, mcus in scan_layout:
        out += b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comps_in_scan), len(comps_in_scan)
        )
        for cix in comps_in_scan:
            tid = 0 if cix == 0 else 1
            out += bytes([cix + 1, (tid << 4) | tid])
        out += b"\x00\x3f\x00"
        out += _encode_scan(mcus)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    w: int, h: int, rgb: bytes, restart_interval: int = 0
) -> bytes:
    """RGB → PROGRESSIVE JFIF (SOF2, 4:4:4) exercising both
    progressive mechanisms end to end: spectral selection (separate
    DC and per-component AC scans) AND successive approximation (all
    first passes at Al=1, then Ah=1→Al=0 refinement passes with
    correction bits / EOB runs per T.81 G.1.2). Same Annex K quant
    tables as the baseline encoder, so a progressive stream and a
    baseline stream of the same image carry IDENTICAL coefficients —
    the decoder equivalence test keys on that. Scan script:

        1  DC  all comps   Ah=0 Al=1      (interleaved)
        2-4  AC  comp c    Ss=1..63 Ah=0 Al=1   (one comp per scan,
                                                 EOB-run coded)
        5  DC refine       Ah=1 Al=0      (raw bits, no Huffman)
        6-8  AC refine     Ss=1..63 Ah=1 Al=0   (correction bits)

    With ``restart_interval`` > 0, a DRI segment is emitted and every
    scan inserts byte-aligned RSTn markers each `ri` MCUs/blocks —
    DC predictors reset and EOB runs flush at each boundary (the
    count pass applies the same run-splitting so the Huffman tables
    match the emitted symbol stream).
    """
    bw, bh, comp_blocks = _rgb_to_quantized_blocks(w, h, rgb)
    nblocks = bw * bh
    # zigzag coefficient vectors per component/block
    zz_all: list[list[list[int]]] = [
        [[int(blk[_ZIGZAG[i]]) for i in range(64)] for blk in comp_blocks[c]]
        for c in range(3)
    ]

    def _entropy(scan_fn, with_tables: bool):
        """Run scan_fn twice: once counting symbol frequencies, once
        emitting — returns (dht_bytes, ecs_bytes). scan_fn(emit, marker)
        where emit(sym, extra_bits: list[(value,length)]) codes one
        Huffman symbol plus appended raw bits (sym None → raw bits only,
        for refinement corrections) and marker(n) inserts a byte-aligned
        RSTn in the emit pass (no-op while counting)."""
        freqs: dict[int, int] = {}

        def count(sym, extra):
            if sym is not None:
                freqs[sym] = freqs.get(sym, 0) + 1

        scan_fn(count, lambda n: None)
        if not with_tables:
            bits = _BitWriter()

            def emit_raw(sym, extra):
                for v, ln in extra:
                    bits.write(v, ln)

            scan_fn(emit_raw, bits.emit_restart)
            return b"", bits.flush()
        counts, symbols = _huffman_table_from_freqs(freqs or {0: 1})
        codes = _canonical_codes(counts, symbols)
        bits = _BitWriter()

        def emit(sym, extra):
            if sym is not None:
                code, ln = codes[sym]
                bits.write(code, ln)
            for v, ln in extra:
                bits.write(v, ln)

        scan_fn(emit, bits.emit_restart)
        dht = b"\xff\xc4" + struct.pack(">H", 19 + len(symbols))
        return dht, bits.flush(), counts, symbols

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, _QT_LUMA), (1, _QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[_ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])

    def _sos(comp_ids: list[int], tdc: list[int], tac: list[int], ss, se, ah, al):
        seg = bytearray()
        seg += struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid, td, ta in zip(comp_ids, tdc, tac):
            seg += bytes([cid + 1, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + bytes(seg)

    AL = 1

    # --- scan 1: DC first pass, interleaved, Al=1, Huffman table 0 ---
    def dc_first(emit, marker):
        prev = [0, 0, 0]
        rst = [0]
        for bi in range(nblocks):
            if restart_interval and bi and bi % restart_interval == 0:
                marker(rst[0])
                rst[0] = (rst[0] + 1) & 7
                prev[:] = [0, 0, 0]
            for c in range(3):
                v = zz_all[c][bi][0] >> AL  # arithmetic shift per spec
                diff = v - prev[c]
                prev[c] = v
                sz = _bit_size(diff)
                emit(sz, [(diff if diff > 0 else diff + (1 << sz) - 1, sz)] if sz else [])

    dht, ecs, counts, symbols = _entropy(dc_first, True)
    out += dht + bytes([0x00]) + bytes(counts) + bytes(symbols)
    out += _sos([0, 1, 2], [0, 0, 0], [0, 0, 0], 0, 0, 0, AL)
    out += ecs

    # --- scans 2-4: AC first pass per component, Al=1, EOB runs ---
    def ac_first_for(c):
        def scan(emit, marker):
            eobrun = [0]
            rst = [0]
            pending: list = []  # (sym, extra) buffered while EOB run open

            def flush_eob():
                if eobrun[0]:
                    n = eobrun[0]
                    r = n.bit_length() - 1
                    emit(r << 4, [(n - (1 << r), r)] if r else [])
                    eobrun[0] = 0
                for sym, extra in pending:
                    emit(sym, extra)
                pending.clear()

            for bi in range(nblocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    marker(rst[0])
                    rst[0] = (rst[0] + 1) & 7
                zz = zz_all[c][bi]
                shifted = [
                    (v >> AL) if v >= 0 else -((-v) >> AL) for v in zz
                ]
                last = max((k for k in range(1, 64) if shifted[k]), default=0)
                if last == 0:
                    eobrun[0] += 1
                    if eobrun[0] == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(1, last + 1):
                    v = shifted[k]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        emit(0xF0, [])
                        run -= 16
                    sz = _bit_size(v)
                    emit((run << 4) | sz, [(v if v > 0 else v + (1 << sz) - 1, sz)])
                    run = 0
                if last < 63:
                    eobrun[0] += 1
            flush_eob()

        return scan

    for c in range(3):
        dht, ecs, counts, symbols = _entropy(ac_first_for(c), True)
        out += dht + bytes([0x10]) + bytes(counts) + bytes(symbols)
        out += _sos([c], [0], [0], 1, 63, 0, AL)
        out += ecs

    # --- scan 5: DC refinement, Ah=1 Al=0 — raw bits, no Huffman ---
    def dc_refine(emit, marker):
        rst = [0]
        for bi in range(nblocks):
            if restart_interval and bi and bi % restart_interval == 0:
                marker(rst[0])
                rst[0] = (rst[0] + 1) & 7
            for c in range(3):
                emit(None, [(zz_all[c][bi][0] & 1, 1)])

    _dht, ecs = _entropy(dc_refine, False)
    out += _sos([0, 1, 2], [0, 0, 0], [0, 0, 0], 0, 0, 1, 0)
    out += ecs

    # --- scans 6-8: AC refinement per component, Ah=1 Al=0 ---
    def ac_refine_for(c):
        def scan(emit, marker):
            eobrun = [0]
            rst = [0]
            # correction bits owed for the open EOB run's blocks
            eob_corr: list = []
            pending: list = []

            def flush_eob():
                if eobrun[0]:
                    n = eobrun[0]
                    r = n.bit_length() - 1
                    emit(r << 4, [(n - (1 << r), r)] + eob_corr)
                    eobrun[0] = 0
                    eob_corr.clear()
                for sym, extra in pending:
                    emit(sym, extra)
                pending.clear()

            for bi in range(nblocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    marker(rst[0])
                    rst[0] = (rst[0] + 1) & 7
                zz = zz_all[c][bi]
                # newly-significant at this pass: |v| >> 0 == 1 but was
                # 0 at Al=1  ⇔  |v| == 1 ; history-nonzero ⇔ |v| >= 2
                last_new = max(
                    (k for k in range(1, 64) if abs(zz[k]) == 1), default=0
                )
                if last_new == 0:
                    # no new coefficients: extend the EOB run, owing a
                    # correction bit for every history-nonzero coeff
                    eobrun[0] += 1
                    for k in range(1, 64):
                        if abs(zz[k]) >= 2:
                            eob_corr.append((zz[k] & 1, 1))
                    if eobrun[0] == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                corr: list = []
                for k in range(1, last_new + 1):
                    v = zz[k]
                    if abs(v) >= 2:  # history-nonzero: correction bit
                        corr.append((v & 1, 1))
                        continue
                    if v == 0:
                        if run == 15:
                            emit(0xF0, corr)
                            corr = []
                            run = 0
                        else:
                            run += 1
                        continue
                    # newly significant: |v| == 1
                    emit((run << 4) | 1, [(1 if v > 0 else 0, 1)] + corr)
                    corr = []
                    run = 0
                # a block whose last NEW coefficient sits at k=63 is
                # fully coded by its symbols — no EOB for it (the
                # decoder's band walk exits by k > Se, not by EOBn);
                # otherwise the trailing region joins the EOB run,
                # with its history coeffs' corrections owed to it
                if last_new < 63:
                    eobrun[0] += 1
                    for k in range(last_new + 1, 64):
                        if abs(zz[k]) >= 2:
                            eob_corr.append((zz[k] & 1, 1))
            flush_eob()

        return scan

    for c in range(3):
        dht, ecs, counts, symbols = _entropy(ac_refine_for(c), True)
        out += dht + bytes([0x10]) + bytes(counts) + bytes(symbols)
        out += _sos([c], [0], [0], 1, 63, 1, 0)
        out += ecs

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # marker (RST handled by caller via sync); treat
                    # as padding here
                    self.pos -= 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Skip to just past the next RST marker (restart sync)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        self.pos = len(self.data)


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read_bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _decode_baseline_block(reader, huff, dc_t, ac_t, prev_dc, cix) -> list[int]:
    """Decode one baseline (full 0..63, DC+AC) block into a zigzag
    coefficient list, updating the per-component DC predictor."""
    zz = [0] * 64
    sym = _decode_huffman(reader, huff[(0, dc_t)])
    diff = _extend(reader.read_bits(sym), sym)
    prev_dc[cix] += diff
    zz[0] = prev_dc[cix]
    i = 1
    while i < 64:
        rs = _decode_huffman(reader, huff[(1, ac_t)])
        if rs == 0x00:
            break
        if rs == 0xF0:
            i += 16
            continue
        i += rs >> 4
        if i > 63:
            raise ValueError("AC index overflow")
        size = rs & 0xF
        zz[i] = _extend(reader.read_bits(size), size)
        i += 1
    return zz


def _decode_baseline_scan(
    data, comps, coef, huff, scan_comps, restart_interval,
    hmax, vmax, mcus_x, mcus_y, w, h,
):
    """Decode one baseline SOS's entropy data into ``coef``.

    Interleaved scans (ns > 1) walk MCUs; a single-component scan is
    non-interleaved per T.81 A.2.2 — the MCU is one block and the walk
    covers only that component's own ceil(samples/8) block grid (the
    MCU-padding blocks outside it stay zero). Restart intervals count
    MCUs, i.e. blocks in the non-interleaved case."""
    comp_scan = []
    for cid, dc_t, ac_t in scan_comps:
        for cix, (cid2, ch_, cv, tq) in enumerate(comps):
            if cid2 == cid:
                comp_scan.append((cix, ch_, cv, dc_t, ac_t))
    reader = _BitReader(data)
    prev_dc = [0] * len(comps)
    mcu_count = 0

    def _maybe_restart():
        nonlocal mcu_count
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            reader.align_to_marker()
            for i in range(len(prev_dc)):
                prev_dc[i] = 0
        mcu_count += 1

    if len(comp_scan) == 1:
        cix, ch_, cv, dc_t, ac_t = comp_scan[0]
        bw_c = (((w * ch_ + hmax - 1) // hmax) + 7) // 8
        bh_c = (((h * cv + vmax - 1) // vmax) + 7) // 8
        for by in range(bh_c):
            for bx in range(bw_c):
                _maybe_restart()
                coef[cix][by, bx, :] = _decode_baseline_block(
                    reader, huff, dc_t, ac_t, prev_dc, cix
                )
        return
    for my in range(mcus_y):
        for mx in range(mcus_x):
            _maybe_restart()
            for cix, ch_, cv, dc_t, ac_t in comp_scan:
                for by in range(cv):
                    for bx in range(ch_):
                        coef[cix][my * cv + by, mx * ch_ + bx, :] = (
                            _decode_baseline_block(
                                reader, huff, dc_t, ac_t, prev_dc, cix
                            )
                        )


def _idct_color_tail(comps, coef, qt, hmax, vmax, w, h) -> tuple[int, int, int, bytes]:
    """Shared decoder back half: zigzag coefficient arrays →
    dequantize, IDCT, chroma upsample, YCbCr→RGB (or gray→RGB)."""
    import numpy as np

    T8 = _dct_matrix()
    planes = []
    for cix, (_cid, ch_, cv, tq) in enumerate(comps):
        q = np.array(qt[tq], dtype=np.float64)
        by_, bx_ = coef[cix].shape[:2]
        plane = np.zeros((by_ * 8, bx_ * 8), dtype=np.float64)
        deq = coef[cix].astype(np.float64) * q[None, None, :]
        nat = np.zeros_like(deq)
        for i in range(64):
            nat[:, :, _ZIGZAG[i]] = deq[:, :, i]
        for by in range(by_):
            for bx in range(bx_):
                blk = nat[by, bx].reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    T8.T @ blk @ T8 + 128.0
                )
        planes.append(plane)
    full = []
    for cix, (_cid, ch_, cv, _tq) in enumerate(comps):
        p_ = planes[cix]
        if ch_ < hmax or cv < vmax:
            p_ = np.repeat(np.repeat(p_, vmax // cv, axis=0), hmax // ch_, axis=1)
        full.append(p_[:h, :w])
    if len(comps) == 1:
        gray = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, 3, np.stack([gray] * 3, axis=-1).tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).round().astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Baseline/extended-sequential Huffman JPEG (SOF0/SOF1) →
    (w, h, 3, RGB rows top-down). Handles multi-scan baseline streams
    (one SOS per component, or any ns ≤ nc split) and DRI/RSTn
    restarts; SOF2 routes to the progressive decoder. Raises
    NotImplementedError for arithmetic / hierarchical / lossless
    streams — the remaining codec-class boundary."""
    import numpy as np

    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qt_id)
    w = h = 0
    restart_interval = 0
    coef: list = []
    saw_scan = False
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = blob[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", blob, pos + 2)[0]
        seg = blob[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                prec, tid = pq_tq >> 4, pq_tq & 0xF
                off += 1
                if prec == 0:
                    qt[tid] = list(seg[off : off + 64])
                    off += 64
                else:
                    qt[tid] = [
                        struct.unpack_from(">H", seg, off + 2 * i)[0]
                        for i in range(64)
                    ]
                    off += 128
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors beyond 2x2")
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [
                np.zeros((mcus_y * cv, mcus_x * ch_, 64), dtype=np.int64)
                for _cid, ch_, cv, _tq in comps
            ]
        elif marker == 0xC2:  # SOF2: progressive — dedicated path
            return _decode_jpeg_progressive(blob)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}): "
                "arithmetic/hierarchical/lossless streams need a full codec"
            )
        elif marker == 0xC4:  # DHT
            _parse_dht_into(seg, huff)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            ecs_start = pos + 2 + ln
            # delimit the entropy-coded segment: next non-RST marker
            p = ecs_start
            while p + 1 < len(blob):
                if blob[p] == 0xFF and blob[p + 1] not in (0x00,) and not (
                    0xD0 <= blob[p + 1] <= 0xD7
                ):
                    break
                p += 1
            _decode_baseline_scan(
                blob[ecs_start:p], comps, coef, huff, scan_comps,
                restart_interval, hmax, vmax, mcus_x, mcus_y, w, h,
            )
            pos = p
            saw_scan = True
            continue
        pos += 2 + ln
    if not comps or not saw_scan:
        raise ValueError("JPEG missing SOS/SOF")
    return _idct_color_tail(comps, coef, qt, hmax, vmax, w, h)


def _parse_dht_into(seg: bytes, huff: dict) -> None:
    off = 0
    while off < len(seg):
        tc_th = seg[off]
        counts = list(seg[off + 1 : off + 17])
        nsym = sum(counts)
        symbols = list(seg[off + 17 : off + 17 + nsym])
        table: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for l in range(1, 17):
            for _ in range(counts[l - 1]):
                table[(l, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        huff[(tc_th >> 4, tc_th & 0xF)] = table
        off += 17 + nsym


def _decode_jpeg_progressive(blob: bytes) -> tuple[int, int, int, bytes]:
    """Progressive JPEG (SOF2) → (w, h, 3, RGB). Full T.81 Annex G
    Huffman-progressive support: multiple SOS scans accumulate into
    per-component coefficient arrays — spectral selection (DC and
    per-component AC band scans), successive approximation (first
    passes at Al>0, refinement passes applying one correction bit per
    already-significant coefficient), AC EOB runs, DRI/RSTn restarts.
    One dequantize + IDCT at the end, then the same
    upsample/YCbCr→RGB tail as the baseline path. The fixture
    generator is ``encode_jpeg_progressive``; the equivalence test
    keys on progressive and baseline streams of one image carrying
    identical coefficients."""
    import numpy as np

    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []
    w = h = 0
    restart_interval = 0
    coef: list = []  # per comp: np.int64 (blocks_y, blocks_x, 64) zigzag
    saw_scan = False
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = blob[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", blob, pos + 2)[0]
        seg = blob[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                prec, tid = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if prec == 0:
                    qt[tid] = list(seg[off : off + 64])
                    off += 64
                else:
                    qt[tid] = [
                        struct.unpack_from(">H", seg, off + 2 * i)[0]
                        for i in range(64)
                    ]
                    off += 128
        elif marker == 0xC4:
            _parse_dht_into(seg, huff)
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xC2:
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors beyond 2x2")
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [
                np.zeros((mcus_y * cv, mcus_x * ch_, 64), dtype=np.int64)
                for _cid, ch_, cv, _tq in comps
            ]
        elif marker == 0xDA:
            ns = seg[0]
            scan: list[tuple[int, int, int]] = []
            for i in range(ns):
                scan.append((seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            ecs_start = pos + 2 + ln
            # delimit the entropy-coded segment: next non-RST marker
            p = ecs_start
            while p + 1 < len(blob):
                if blob[p] == 0xFF and blob[p + 1] not in (0x00,) and not (
                    0xD0 <= blob[p + 1] <= 0xD7
                ):
                    break
                p += 1
            _decode_progressive_scan(
                blob[ecs_start:p], comps, coef, huff, scan,
                ss, se, ah, al, restart_interval,
                hmax, vmax, mcus_x, mcus_y, w, h,
            )
            pos = p
            saw_scan = True
            continue
        pos += 2 + ln
    if not comps or not coef or not saw_scan:
        raise ValueError("progressive JPEG missing SOF2/scan data")
    return _idct_color_tail(comps, coef, qt, hmax, vmax, w, h)


def _decode_progressive_scan(
    data, comps, coef, huff, scan, ss, se, ah, al, restart_interval,
    hmax, vmax, mcus_x, mcus_y, w, h,
):
    """Decode one progressive SOS's entropy data into ``coef``."""
    reader = _BitReader(data)
    cix_of = {cid: i for i, (cid, *_rest) in enumerate(comps)}
    members = [(cix_of[cid], dc_t, ac_t) for cid, dc_t, ac_t in scan]
    state = {"eobrun": 0}
    pred = [0] * len(comps)

    def dc_first(zz, cix, dc_t):
        sym = _decode_huffman(reader, huff[(0, dc_t)])
        pred[cix] += _extend(reader.read_bits(sym), sym)
        zz[0] = pred[cix] << al

    def dc_refine(zz):
        if reader.read_bit():
            zz[0] |= 1 << al

    p1, m1 = 1 << al, -1 << al

    def ac_first(zz, ac_t):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huffman(reader, huff[(1, ac_t)])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def _correct(zz, k):
        if reader.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    def ac_refine(zz, ac_t):
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_huffman(reader, huff[(1, ac_t)])
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (
                            reader.read_bits(r) if r else 0
                        )
                        break
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        _correct(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    _correct(zz, k)
                k += 1
            state["eobrun"] -= 1

    def do_block(cix, by, bx, dc_t, ac_t):
        zz = coef[cix][by, bx]
        if ss == 0:
            if ah == 0:
                dc_first(zz, cix, dc_t)
            else:
                dc_refine(zz)
        else:
            if ah == 0:
                ac_first(zz, ac_t)
            else:
                ac_refine(zz, ac_t)

    def restart():
        reader.align_to_marker()
        state["eobrun"] = 0
        for i in range(len(pred)):
            pred[i] = 0

    unit = 0
    if len(members) > 1:
        # interleaved (DC scans): MCU order, sampling-factor blocks
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                for cix, dc_t, ac_t in members:
                    _cid, ch_, cv, _tq = comps[cix]
                    for by in range(cv):
                        for bx in range(ch_):
                            do_block(cix, my * cv + by, mx * ch_ + bx, dc_t, ac_t)
    else:
        # non-interleaved: the component's OWN block raster (its true
        # size, not the MCU-padded grid)
        cix, dc_t, ac_t = members[0]
        _cid, ch_, cv, _tq = comps[cix]
        cbw = (-(-(w * ch_) // hmax) + 7) // 8
        cbh = (-(-(h * cv) // vmax) + 7) // 8
        for by in range(cbh):
            for bx in range(cbw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                do_block(cix, by, bx, dc_t, ac_t)


def decode_image_real(blob: bytes, fmt: str | None = None) -> tuple[int, int, int, bytes]:
    """Real decode: sniff the container by magic bytes and recover
    actual pixels → (width, height, channels, pixel bytes — rows
    top-down). BMP/PPM/PNG/JPEG (baseline incl. multi-scan and
    restarts, progressive)/GIF/TIFF, WebP-LOSSLESS (VP8L,
    operators/webp.py), WebP-LOSSY (VP8 keyframes, operators/vp8.py)
    and extended WebP stills (VP8X + ALPH alpha) decode with stdlib +
    numpy alone; the remaining codec-class boundary is animated WebP
    (ANIM/ANMF) and inter-coded video, which raise
    NotImplementedError — the declared swap-in point for a PIL/ffmpeg
    kernel."""
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] == b"P6":
        return _decode_ppm(blob)
    if blob[:3] == b"\xff\xd8\xff":
        return _decode_jpeg(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        # lossless (VP8L) decodes natively (operators/webp.py, r8);
        # lossy stills (VP8 keyframes) decode natively too
        # (operators/vp8.py, r11, pixel-exact vs libwebp at the YUV
        # level), as do extended VP8X stills (ALPH alpha plane,
        # byte-exact vs libwebp); only animation (ANIM/ANMF) still
        # raises — the narrowed remaining codec boundary
        if blob[12:16] == b"VP8 ":
            from firefly_vcut_spark.operators.vp8 import decode_webp_lossy

            return decode_webp_lossy(blob)
        if blob[12:16] == b"VP8X":
            from firefly_vcut_spark.operators.vp8 import decode_webp_extended

            return decode_webp_extended(blob)
        from firefly_vcut_spark.operators.webp import decode_vp8l

        return decode_vp8l(blob)
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
        # position-weighted checksum sum(px[i]*(i+1)) mod 2^31-1: unlike
        # the mean (invariant under any pixel permutation) this moves if
        # a row-order/interlace regression permutes pixels, and a DuckDB
        # oracle can recompute it closed-form (md5 of binary cannot)
        T.StructField("pos_checksum", T.LongType()),
    ]
)

_POS_MOD = 2**31 - 1


def _pos_checksum(px: bytes) -> int:
    return sum(v * (i + 1) for i, v in enumerate(px)) % _POS_MOD


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


def encode_synthetic_webp(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): each doc gets a real RIFF/VP8L
    (WebP-lossless) container of its synthetic 4-channel pattern. The
    encode MODE rotates by doc_id — plain LZ77, subtract-green,
    single-tile predictor (mode cycling through all 14), single-tile
    color transform, color cache, 1-tile meta-prefix — so a corpus
    scan exercises every VP8L decoder path while the decoded pixels
    (and hence the oracle) stay mode-invariant."""
    from firefly_vcut_spark.operators.webp import encode_vp8l

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 8 + i % 9, 6 + i % 5
                rgba = synthetic_pixels(i, w, h, ch=4)
                mode = i % 6
                kw = {}
                if mode == 1:
                    kw["transform"] = "subtract_green"
                elif mode == 2:
                    kw["transform"] = ("predictor", i % 14)
                elif mode == 3:
                    kw["transform"] = ("color", (17, 200, 5))
                elif mode == 4:
                    kw["cache_bits"] = 6
                elif mode == 5:
                    kw["use_meta"] = True
                blobs.append(encode_vp8l(rgba, w, h, **kw))
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
                out["pos_checksum"].append(_pos_checksum(px))
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


# ---------------------------------------------------------------------------
# GIF (LZW) — from-scratch codec: variable-width LSB-first LZW with
# clear/end codes and 12-bit cap, interlace, local/global palettes,
# first-frame composition onto the logical screen. The encoder is a
# real compressing LZW (dict hits, width growth, clear-on-full) that
# SIMULATES the decoder's width schedule, so both sides are provably
# in lockstep; the decoder is additionally pinned by hand-packed
# code-stream fixtures in tests/test_multimodal_decode.py.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR resets the table
    and width, width grows when the table reaches 1<<width (cap 12),
    the c == next_code self-reference case per spec."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while len(out) < expect:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out[:expect])
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        c = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if c == end:
            break
        if c == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if c in table:
            entry = table[c]
        elif c == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {c}")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        out += entry
    return bytes(out[:expect])


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Compressing GIF LZW. Width bookkeeping runs a SIMULATION of the
    decoder (dec_adds lags the encoder's dict adds by one code — the
    classic off-by-one), so every emitted code uses exactly the width
    the decoder will read it with. CLEAR is emitted when the table
    fills (both sides reset)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return (
            {bytes([i]): i for i in range(clear)},  # dict
            end + 1,  # encoder next_code
            min_code_size + 1,  # decoder-visible width
            end + 1,  # decoder next_code (lags by one emitted code)
            0,  # codes emitted since clear
        )

    table, next_code, width, dec_next, emitted = fresh()

    def emit(code: int) -> None:
        nonlocal width, dec_next, emitted
        put(code, width)
        emitted += 1
        # the decoder adds an entry after every non-first code and
        # widens when ITS table hits 1<<width — mirror that schedule
        if emitted >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    put(clear, width)
    buf = b""
    for px in indices:
        nxt = buf + bytes([px])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:
            put(clear, width)
            table, next_code, width, dec_next, emitted = fresh()
        buf = nxt[-1:]
    if buf:
        emit(table[buf])
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace (start, step)


def _interlace_order(h: int) -> list[int]:
    rows = []
    for start, step in _GIF_PASSES:
        rows.extend(range(start, h, step))
    return rows


def _decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    """GIF87a/89a first frame → (w, h, 3, RGB rows top-down): frame
    composited at (left, top) on the logical screen filled with the
    background color; transparent pixels keep the background."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = blob[pos : pos + 3 * n]
        pos += 3 * n
    transparent = None
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = blob[pos]
            pos += 1
            while True:
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                if label == 0xF9 and sz == 4 and blob[pos] & 1:
                    transparent = blob[pos + 3]
                pos += sz
            continue
        if b0 == 0x2C:  # image descriptor — decode the FIRST frame
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = blob[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while True:
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                data += blob[pos : pos + sz]
                pos += sz
            idx = _gif_lzw_decode(bytes(data), min_code, iw * ih)
            if iflags & 0x40:  # interlaced: rows arrive in pass order
                rows = bytearray(iw * ih)
                for src_i, dst_row in enumerate(_interlace_order(ih)):
                    rows[dst_row * iw : (dst_row + 1) * iw] = idx[
                        src_i * iw : (src_i + 1) * iw
                    ]
                idx = bytes(rows)
            n_colors = len(ct) // 3
            # background index is defined against the GLOBAL color table
            # (GIF89a §18), never a frame's local table
            bg = (
                gct[3 * bg_idx : 3 * bg_idx + 3]
                if gct is not None and bg_idx < len(gct) // 3
                else b"\x00\x00\x00"
            )
            if len(bg) < 3:
                bg = b"\x00\x00\x00"
            canvas = bytearray(bg * (w * h))
            for fy in range(ih):
                y = top + fy
                if y >= h:
                    continue
                for fx in range(iw):
                    x = left + fx
                    if x >= w:
                        continue
                    ci = idx[fy * iw + fx]
                    if ci == transparent or ci >= n_colors:
                        continue
                    canvas[3 * (y * w + x) : 3 * (y * w + x) + 3] = ct[
                        3 * ci : 3 * ci + 3
                    ]
            return w, h, 3, bytes(canvas)
    raise ValueError("GIF missing image data")


def encode_gif(
    w: int, h: int, rgb: bytes, *, interlace: bool = False
) -> bytes:
    """RGB rows → single-frame GIF89a with a global palette built from
    the image (≤256 distinct colors required — GIF is palettized;
    lossless for such images, unlike JPEG). Fixture generator for
    ``_decode_gif``; ``interlace=True`` writes rows in 4-pass order."""
    px = [rgb[3 * i : 3 * i + 3] for i in range(w * h)]
    palette = sorted(set(px))
    if len(palette) > 256:
        raise ValueError("encode_gif requires <= 256 distinct colors")
    cix = {c: i for i, c in enumerate(palette)}
    bits = max(2, (len(palette) - 1).bit_length())
    table_n = 1 << bits
    indices = bytearray(cix[c] for c in px)
    if interlace:
        reordered = bytearray()
        for row in _interlace_order(h):
            reordered += indices[row * w : (row + 1) * w]
        indices = reordered
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4 | (bits - 1), 0, 0)
    for i in range(table_n):
        out += palette[i] if i < len(palette) else b"\x00\x00\x00"
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(bits)
    lzw = _gif_lzw_encode(bytes(indices), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def synthetic_palette_pixels(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic ≤16-color pattern (GIF needs a palette):
    index(x, y) = (x*7 + y*31 + doc_id) % 16, palette[i] =
    (i*17 % 256, i*53 % 256, i*97 % 256). Pure integer function of
    (doc_id, x, y) — DuckDB recomputes the expected stats directly."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            i = (x * 7 + y * 31 + doc_id) % 16
            out += bytes(((i * 17) % 256, (i * 53) % 256, (i * 97) % 256))
    return bytes(out)


def encode_synthetic_gif(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): each doc's palette pattern in a real
    single-frame GIF89a (LZW-compressed; every 3rd doc interlaced so
    both row orders ride through the corpus)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 8 + i % 9, 6 + i % 5
                blobs.append(
                    encode_gif(
                        w,
                        h,
                        synthetic_palette_pixels(i, w, h),
                        interlace=(i % 3 == 0),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, blob binary"
    )


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0): II/MM byte orders, IFD walk, strip layout,
# 8-bit gray / RGB / palette-color, compression none(1) / LZW(5,
# MSB-first codes with early code-width change, the TIFF variant) /
# PackBits(32773). Predictor 2 (horizontal differencing) supported.
# ---------------------------------------------------------------------------


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: 8-bit roots, codes MSB-first, ClearCode=256,
    EOI=257, and the EARLY width change (width bumps when the NEXT
    add would reach 1<<width − 1, one code earlier than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    width = 9
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expect])
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad TIFF LZW code {code}")
        if prev is not None:
            table.append(prev + entry[:1])
        # early change: width grows so the NEXT code can address the
        # entry about to be added (TIFF 6.0 spec, 'LZW' section)
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
        out += entry
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Compressing TIFF LZW mirroring the decoder's early-change
    width schedule (encoder and decoder table sizes stay in lockstep
    because the encoder's add at emission i is the decoder's add at
    code i+1 — the early change absorbs the lag)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    buf = b""
    for b in data:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        put(table[buf], width)
        table[nxt] = next_code
        next_code += 1
        # the decoder's add for this code happens one code LATER, and
        # its early change fires at table size (1<<w)-1 — in lockstep
        # that means the encoder widens when next_code reaches 1<<w
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table full under early change: reset
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        buf = nxt[-1:]
    if buf:
        put(table[buf], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    p = 0
    while p < len(data) and len(out) < expect:
        n = data[p]
        p += 1
        if n < 128:
            out += data[p : p + n + 1]
            p += n + 1
        elif n > 128:
            out += bytes([data[p]]) * (257 - n)
            p += 1
        # n == 128: no-op per spec
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """Simple valid PackBits: runs ≥3 as replicates, else literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            # a short run may not push the literal past 128 bytes: header
            # byte 128 is the PackBits no-op, so a 129-byte literal would
            # be misparsed by every conforming decoder
            if i - lit_start + run > 128:
                break
            i += run
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _decode_tiff(blob: bytes) -> tuple[int, int, int, bytes]:
    """Baseline TIFF first IFD → (w, h, channels, rows top-down)."""
    if blob[:4] == b"II*\x00":
        e = "<"
    elif blob[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    ifd_off = struct.unpack_from(e + "I", blob, 4)[0]
    n_tags = struct.unpack_from(e + "H", blob, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", blob, off)
        if typ not in _SZ:
            continue
        total = _SZ[typ] * cnt
        voff = off + 8 if total <= 4 else struct.unpack_from(e + "I", blob, off + 8)[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(
            struct.unpack_from(e + fmt * cnt, blob, voff)
        )
    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    predictor = one(317, 1)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF BitsPerSample={bits}")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression={comp}")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric={photo}")
    rows_per_strip = one(278, h)
    strip_offs = tags.get(273)
    strip_counts = tags.get(279)
    if not strip_offs or not strip_counts:
        raise ValueError("TIFF missing strip layout")
    stride = w * spp
    raw = bytearray()
    row0 = 0
    for s, (soff, scnt) in enumerate(zip(strip_offs, strip_counts)):
        nrows = min(rows_per_strip, h - row0)
        expect = nrows * stride
        seg = blob[soff : soff + scnt]
        if comp == 1:
            raw += seg[:expect]
        elif comp == 5:
            raw += _tiff_lzw_decode(seg, expect)
        else:
            raw += _packbits_decode(seg, expect)
        row0 += nrows
    px = bytearray(raw[: h * stride])
    if predictor == 2:  # horizontal differencing, per row per channel
        for y in range(h):
            base = y * stride
            for i in range(spp, stride):
                px[base + i] = (px[base + i] + px[base + i - spp]) & 0xFF
    if photo == 3:  # palette-color: ColorMap is 16-bit per channel
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        out = bytearray(w * h * 3)
        for i in range(w * h):
            ci = px[i]
            if ci >= n:
                raise ValueError("TIFF palette index out of range")
            out[3 * i] = cmap[ci] >> 8
            out[3 * i + 1] = cmap[n + ci] >> 8
            out[3 * i + 2] = cmap[2 * n + ci] >> 8
        return w, h, 3, bytes(out)
    if photo == 0:  # WhiteIsZero: invert to the gray convention
        px = bytearray(255 - v for v in px)
    return w, h, spp, bytes(px)


def encode_tiff(
    w: int,
    h: int,
    px: bytes,
    channels: int = 3,
    *,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: int = 1,
) -> bytes:
    """Baseline TIFF writer (gray spp=1 or RGB spp=3, 8-bit, strip
    layout, compression 1/5/32773, optional horizontal-differencing
    predictor with LZW) — fixture generator for ``_decode_tiff``."""
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    stride = w * channels
    strips = []
    for row0 in range(0, h, rps):
        nrows = min(rps, h - row0)
        seg = bytearray(px[row0 * stride : (row0 + nrows) * stride])
        if predictor == 2:
            for y in range(nrows):
                base = y * stride
                for i in range(stride - 1, channels - 1, -1):
                    seg[i + base] = (seg[i + base] - seg[i + base - channels]) & 0xFF
        seg = bytes(seg)
        if compression == 5:
            strips.append(_tiff_lzw_encode(seg))
        elif compression == 32773:
            strips.append(_packbits_encode(seg))
        else:
            strips.append(seg)
    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    # layout: header(8) | IFD | bits array | strip data
    tags = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, channels, None),  # BitsPerSample (array if >1)
        (259, 3, 1, compression),
        (262, 3, 1, 1 if channels == 1 else 2),
        (273, 4, len(strips), None),  # StripOffsets
        (277, 3, 1, channels),
        (278, 3, 1, rps),
        (279, 4, len(strips), None),  # StripByteCounts
        (317, 3, 1, predictor),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_len
    extra = bytearray()

    def alloc(fmt_vals: bytes) -> int:
        nonlocal extra
        off = extra_off + len(extra)
        extra += fmt_vals
        return off

    bits_ptr = None
    if channels > 1:
        bits_ptr = alloc(struct.pack(e + "H" * channels, *([8] * channels)))
    # reserve the strip offset/count arrays if >1 strip
    offs_ptr = counts_ptr = None
    if len(strips) > 1:
        offs_ptr = alloc(b"\x00" * 4 * len(strips))
        counts_ptr = alloc(b"\x00" * 4 * len(strips))
    strip_data_off = extra_off + len(extra)
    offsets = []
    o = strip_data_off
    for s in strips:
        offsets.append(o)
        o += len(s)
    if len(strips) > 1:
        struct.pack_into(e + "I" * len(strips), extra, offs_ptr - extra_off, *offsets)
        struct.pack_into(
            e + "I" * len(strips), extra, counts_ptr - extra_off,
            *[len(s) for s in strips],
        )
    ifd = struct.pack(e + "H", len(tags))
    for tag, typ, cnt, val in tags:
        if tag == 258:
            if channels == 1:
                ifd += struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + "HH", 8, 0)
            else:
                ifd += struct.pack(e + "HHII", tag, typ, cnt, bits_ptr)
        elif tag == 273:
            if len(strips) == 1:
                ifd += struct.pack(e + "HHII", tag, typ, 1, offsets[0])
            else:
                ifd += struct.pack(e + "HHII", tag, typ, cnt, offs_ptr)
        elif tag == 279:
            if len(strips) == 1:
                ifd += struct.pack(e + "HHII", tag, typ, 1, len(strips[0]))
            else:
                ifd += struct.pack(e + "HHII", tag, typ, cnt, counts_ptr)
        elif typ == 3:
            ifd += struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + "HH", val, 0)
        else:
            ifd += struct.pack(e + "HHII", tag, typ, cnt, val)
    ifd += struct.pack(e + "I", 0)  # next IFD
    assert len(ifd) == ifd_len
    return header + ifd + bytes(extra) + b"".join(strips)


def encode_synthetic_tiff(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, blob): each doc's synthetic_pixels pattern
    in a real baseline TIFF — compression rotates none/LZW/PackBits
    by doc_id so every codec path runs corpus-wide, LZW docs also
    rotate the horizontal-differencing predictor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 8 + i % 9, 6 + i % 5
                comp = (1, 5, 32773)[i % 3]
                blobs.append(
                    encode_tiff(
                        w,
                        h,
                        synthetic_pixels(i, w, h),
                        3,
                        compression=comp,
                        big_endian=(i % 2 == 1),
                        rows_per_strip=3 if i % 5 == 0 else None,
                        predictor=2 if comp == 5 and i % 2 == 0 else 1,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, blob binary"
    )


VP8_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("y_md5", T.StringType()),
        T.StructField("u_md5", T.StringType()),
        T.StructField("v_md5", T.StringType()),
        T.StructField("alpha_md5", T.StringType()),
        T.StructField("mean_y", T.DoubleType()),
    ]
)


def decode_vp8_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas kernel over REAL lossy / extended WebP containers:
    each blob decodes with the from-scratch VP8 keyframe decoder
    (operators/vp8.py) and reduces to the plane md5s + mean luma that
    the committed libwebp truth rows record. Input: (name, blob).
    Blobs never shuffle — the kernel runs where the rows sit, same as
    every other multimodal kernel."""
    import struct as _S

    from firefly_vcut_spark.operators.vp8 import (
        decode_frame,
        decode_webp_extended,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in VP8_DECODED_SCHEMA.fields}
            for name, blob in zip(pdf["name"], pdf["blob"]):
                blob = bytes(blob)
                if blob[12:16] == b"VP8X":
                    w, h, _ch, px = decode_webp_extended(blob)
                    alpha = bytes(px[4 * i + 3] for i in range(w * h))
                    alpha_md5 = hashlib.md5(alpha).hexdigest()
                    pos = 12
                    vp8c = None
                    while pos + 8 <= len(blob):
                        tag = blob[pos:pos + 4]
                        size = _S.unpack_from("<I", blob, pos + 4)[0]
                        if tag == b"VP8 ":
                            vp8c = blob[pos + 8:pos + 8 + size]
                        pos += 8 + size + (size & 1)
                    frame = decode_frame(vp8c)
                else:
                    from firefly_vcut_spark.operators.vp8 import decode_webp_vp8

                    frame = decode_webp_vp8(blob)
                    alpha_md5 = ""
                out["name"].append(name)
                out["width"].append(frame.width)
                out["height"].append(frame.height)
                out["y_md5"].append(hashlib.md5(frame.y).hexdigest())
                out["u_md5"].append(hashlib.md5(frame.u).hexdigest())
                out["v_md5"].append(hashlib.md5(frame.v).hexdigest())
                out["alpha_md5"].append(alpha_md5)
                out["mean_y"].append(
                    round(sum(frame.y) / len(frame.y), 6)
                )
            yield pd.DataFrame(out)

    return blobs.select("name", "blob").mapInPandas(kernel, VP8_DECODED_SCHEMA)
