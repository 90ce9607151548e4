"""Real image decode: pure-stdlib BMP/PPM/PNG decoders must recover
the exact pixels from fixtures generated here (encoders below build
the containers byte-by-byte, so the expected pixel buffer is known a
priori), and the Arrow mapInPandas kernel must carry them end to end.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from firefly_vcut_spark.operators.multimodal import (
    decode_features_real,
    decode_image_real,
)


def _pixels(w: int, h: int, ch: int) -> bytes:
    """Deterministic pixel pattern covering the byte range."""
    return bytes(
        (x * 7 + y * 31 + c * 101 + 13) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB bottom-up BMP from top-down RGB rows."""
    row_size = ((w * 3 + 3) // 4) * 4
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            i = (y * w + x) * 3
            r, g, b = rgb[i : i + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        data += row
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + bytes(data)


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n# fixture comment\n%d %d\n255\n" % (w, h) + rgb


def encode_png(w: int, h: int, px: bytes, ch: int, filters: list[int]) -> bytes:
    """PNG with a CHOSEN filter per row (exercises every unfilter
    branch in the decoder). ``filters`` must have one entry per row."""
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    stride = w * ch
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        row = bytearray(px[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray(row)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (row[i] - row[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                enc[i] = (row[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (row[i] - pr) & 0xFF
        raw += bytes([f]) + enc
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_bmp_roundtrip_exact_pixels():
    w, h = 5, 4  # width 5 → BMP rows need padding (15 → 16 bytes)
    rgb = _pixels(w, h, 3)
    got = decode_image_real(encode_bmp(w, h, rgb))
    assert got == (w, h, 3, rgb)


def test_ppm_roundtrip_exact_pixels():
    w, h = 7, 3
    rgb = _pixels(w, h, 3)
    got = decode_image_real(encode_ppm(w, h, rgb))
    assert got == (w, h, 3, rgb)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_all_filters(ch):
    w, h = 6, 5
    px = _pixels(w, h, ch)
    blob = encode_png(w, h, px, ch, filters=[0, 1, 2, 3, 4])
    got = decode_image_real(blob)
    assert got == (w, h, ch, px)


def test_codec_formats_still_guarded():
    """The codec boundary after the r5 progressive-JPEG decoder: WebP
    and arithmetic-coded JPEG raise NotImplementedError; a progressive
    stream with no scan data and junk stay ValueError."""
    # lossy VP8 and extended-alpha stills decode natively since r11;
    # the WebP boundary narrows to animation (VP8X ANIM flag)
    anim_vp8x = b"\x02" + b"\x00" * 9
    with pytest.raises(NotImplementedError):
        decode_image_real(
            b"RIFF\x00\x00\x00\x00WEBPVP8X"
            + len(anim_vp8x).to_bytes(4, "little") + anim_vp8x
        )
    # a junk lossy payload is malformed, not out-of-scope
    with pytest.raises(ValueError):
        decode_image_real(
            b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 8
        )
    # arithmetic-coded sequential (SOF9) stays out of scope
    sof9 = b"\xff\xd8\xff\xc9" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError):
        decode_image_real(sof9)
    # progressive frame header with no SOS/entropy data is malformed
    sof2 = b"\xff\xd8\xff\xc2" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(ValueError):
        decode_image_real(sof2)
    with pytest.raises(ValueError):
        decode_image_real(b"\xff\xd8\xff\xe0" + b"\x00\x04\x00\x00")  # no SOF/SOS
    with pytest.raises(ValueError):
        decode_image_real(b"garbage-bytes")


def test_jpeg_baseline_roundtrip_within_quant_error():
    """Real JPEG decode: a from-scratch baseline stream (image-derived
    canonical Huffman tables, Annex K quant, 4:4:4) round-trips with
    small error on smooth content — gradient MAE ~2 validates the
    DCT/quant/Huffman math against the format, not just against our
    own encoder's inverse; a flat field is near-exact."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import encode_jpeg_baseline

    h, w = 40, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        np.stack(
            [
                xx * 255 / (w - 1),
                yy * 255 / (h - 1),
                (xx + yy) * 255 / (w + h - 2),
            ],
            axis=-1,
        )
        .round()
        .astype(np.uint8)
    )
    got_w, got_h, ch, out = decode_image_real(
        encode_jpeg_baseline(w, h, img.tobytes())
    )
    assert (got_w, got_h, ch) == (w, h, 3)
    err = np.abs(
        img.astype(int) - np.frombuffer(out, np.uint8).reshape(h, w, 3)
    )
    assert err.mean() < 4.0 and err.max() <= 20

    flat = bytes([77, 128, 200]) * (16 * 16)
    _, _, _, out2 = decode_image_real(encode_jpeg_baseline(16, 16, flat))
    err2 = np.abs(
        np.frombuffer(flat, np.uint8).astype(int)
        - np.frombuffer(out2, np.uint8).astype(int)
    )
    assert err2.mean() < 3.0


def test_jpeg_baseline_odd_dimensions_and_harsh_content():
    """Non-multiple-of-8 dimensions exercise the edge-replication
    padding; the synthetic sawtooth is JPEG's worst case, so only
    bounded (not small) error is asserted — plus the exact container
    dims must survive."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        encode_jpeg_baseline,
        synthetic_pixels,
    )

    for doc_id, w, h in [(3, 13, 9), (5, 8, 8), (11, 17, 25)]:
        rgb = synthetic_pixels(doc_id, w, h)
        got_w, got_h, ch, out = decode_image_real(
            encode_jpeg_baseline(w, h, rgb)
        )
        assert (got_w, got_h, ch) == (w, h, 3)
        assert len(out) == w * h * 3
        err = np.abs(
            np.frombuffer(rgb, np.uint8).astype(int)
            - np.frombuffer(out, np.uint8).astype(int)
        )
        assert err.mean() < 40  # sawtooth quant error, bounded


def test_decode_features_real_kernel(spark):
    """End-to-end through Arrow mapInPandas: mixed-container blobs in
    one DataFrame, features must match the a-priori pixel buffers."""
    w, h = 5, 4
    rgb = _pixels(w, h, 3)
    rgba = _pixels(w, h, 4)
    blobs = {
        1: (encode_bmp(w, h, rgb), 3, rgb),
        2: (encode_ppm(w, h, rgb), 3, rgb),
        3: (encode_png(w, h, rgba, 4, [4, 3, 2, 1]), 4, rgba),
    }
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _, _) in blobs.items()],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in decode_features_real(df).collect()}
    assert set(rows) == set(blobs)
    for i, (_, ch, px) in blobs.items():
        r = rows[i]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert r.pixel_checksum == hashlib.md5(px).hexdigest()
        assert r.mean_pixel == round(sum(px) / len(px), 6)
        assert r.pos_checksum == sum(
            v * (j + 1) for j, v in enumerate(px)
        ) % (2**31 - 1)


# --- real WAV container (r4) ---


def test_wav_roundtrip_known_samples():
    import hashlib
    import struct

    from firefly_vcut_spark.operators.multimodal import decode_wav, encode_wav

    samples = [0, 1, -1, 32767, -32768, 1024]
    blob = encode_wav(16000, samples)
    ch, rate, data = decode_wav(blob)
    assert (ch, rate) == (1, 16000)
    assert list(struct.unpack(f"<{len(samples)}h", data)) == samples
    assert hashlib.md5(data.hex().encode()).hexdigest() == hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples).hex().encode()
    ).hexdigest()


def test_wav_decoder_tolerates_extra_chunks():
    import struct

    from firefly_vcut_spark.operators.multimodal import decode_wav, encode_wav

    blob = encode_wav(8000, [5, -5])
    # splice a LIST chunk (odd size => padded) between fmt and data
    head, tail = blob[:36], blob[36:]
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = head + extra + tail
    ch, rate, data = decode_wav(spliced)
    assert (ch, rate) == (1, 8000)
    assert struct.unpack("<2h", data) == (5, -5)


def test_wav_decoder_guards():
    import struct

    import pytest as _pytest

    from firefly_vcut_spark.operators.multimodal import decode_wav, encode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"nonsense")
    blob = bytearray(encode_wav(8000, [1, 2]))
    struct.pack_into("<H", blob, 20, 85)  # format tag 85 = MP3
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))


# --- real raw-video container (r4) ---


def test_rvid_roundtrip_and_guards():
    import pytest as _pytest

    from firefly_vcut_spark.operators.multimodal import (
        decode_rvid,
        encode_rvid,
        synthetic_frame,
    )

    frames = [synthetic_frame(7, f, 4, 2) for f in range(3)]
    blob = encode_rvid(4, 2, 12, frames)
    w, h, fps, got = decode_rvid(blob)
    assert (w, h, fps) == (4, 2, 12)
    assert got == frames
    with _pytest.raises(NotImplementedError):
        decode_rvid(b"\x00\x00\x00\x20ftypisom...")  # MP4-ish magic
    with _pytest.raises(ValueError):
        decode_rvid(blob[:-1])  # torn payload


def test_wav_roundtrip_property():
    """Hypothesis: any int16 sample list and rate round-trips through
    encode_wav → decode_wav identically."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from firefly_vcut_spark.operators.multimodal import decode_wav, encode_wav

    @settings(max_examples=200, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
        ),
        rate=st.integers(min_value=1, max_value=192_000),
    )
    def roundtrip(samples, rate):
        ch, got_rate, data = decode_wav(encode_wav(rate, samples))
        assert (ch, got_rate) == (1, rate)
        assert list(struct.unpack(f"<{len(samples)}h", data)) == samples

    roundtrip()


def test_rvid_roundtrip_property():
    """Hypothesis: any (w, h, fps, frame bytes) round-trips through
    encode_rvid → decode_rvid identically."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from firefly_vcut_spark.operators.multimodal import decode_rvid, encode_rvid

    @settings(max_examples=100, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=8),
        h=st.integers(min_value=1, max_value=8),
        fps=st.integers(min_value=1, max_value=120),
        nf=st.integers(min_value=0, max_value=5),
        data=st.data(),
    )
    def roundtrip(w, h, fps, nf, data):
        frames = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                    )
                )
            )
            for _ in range(nf)
        ]
        got = decode_rvid(encode_rvid(w, h, fps, frames))
        assert got == (w, h, fps, frames)

    roundtrip()


def test_jpeg_progressive_equals_baseline_decode():
    """The from-scratch PROGRESSIVE codec (SOF2: spectral selection +
    successive approximation + AC EOB runs) must decode to pixels
    IDENTICAL to the baseline stream of the same image: both encoders
    share quant tables, so the coefficient sets are equal and any
    pixel difference would be a scan-decode bug, not quant error."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        np.full((40, 56, 3), 128, np.uint8),                      # flat
        rng.integers(0, 256, (64, 48, 3)).astype(np.uint8),       # noise
        (np.indices((32, 32)).sum(0) % 2 * 255)
        .astype(np.uint8)[..., None]
        .repeat(3, -1),                                           # checker
        np.where(rng.random((80, 80, 3)) < 0.01, 255, 0)
        .astype(np.uint8),                                        # sparse
    ]
    x = np.linspace(0, 255, 37)[None, :, None]
    y = np.linspace(0, 255, 21)[:, None, None]
    cases.append(
        np.clip(x * 0.5 + y * 0.4 + rng.integers(0, 40, (21, 37, 3)), 0, 255)
        .astype(np.uint8)
    )                                                             # gradient, odd dims
    for img in cases:
        h, w = img.shape[:2]
        rgb = np.ascontiguousarray(img).tobytes()
        assert decode_image_real(
            encode_jpeg_progressive(w, h, rgb)
        ) == decode_image_real(encode_jpeg_baseline(w, h, rgb)), (w, h)


def test_jpeg_progressive_randomized_equivalence():
    """Randomized sweep over sizes/content classes — every stream must
    be coefficient-exact vs its baseline twin."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    for seed in range(12):
        r = np.random.default_rng(seed)
        w, h = int(r.integers(8, 90)), int(r.integers(8, 70))
        kind = seed % 3
        if kind == 0:
            img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            img = np.where(
                r.random((h, w, 3)) < 0.05,
                r.integers(0, 256, (h, w, 3)),
                100,
            ).astype(np.uint8)
        else:
            img = (r.integers(0, 2, (h, w, 1)) * 255).astype(np.uint8).repeat(3, -1)
        rgb = np.ascontiguousarray(img).tobytes()
        assert decode_image_real(
            encode_jpeg_progressive(w, h, rgb)
        ) == decode_image_real(encode_jpeg_baseline(w, h, rgb)), (seed, w, h)


def test_jpeg_progressive_restart_markers():
    """DRI/RSTn inside progressive scans: the decoder must resync at
    every restart boundary (DC predictor reset, EOB-run flush, byte
    realignment) in all four scan kinds — pixels stay identical to the
    unrestarted and baseline streams for intervals that land mid-run,
    every block, and off-phase."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    for seed in (0, 3):
        r = np.random.default_rng(seed)
        w, h = int(r.integers(16, 64)), int(r.integers(16, 48))
        img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rgb = img.tobytes()
        want = decode_image_real(encode_jpeg_baseline(w, h, rgb))
        for ri in (1, 3, 7):
            got = decode_image_real(
                encode_jpeg_progressive(w, h, rgb, restart_interval=ri)
            )
            assert got == want, (seed, w, h, ri)

def test_jpeg_baseline_multi_scan_stream():
    """A spec-legal MULTI-SCAN baseline stream (one non-interleaved
    SOS per component, T.81 A.2.2) must decode to pixels identical to
    the single interleaved scan of the same image — the coefficient
    sets are equal by construction, so any difference is a scan-walk
    bug (wrong raster, chroma left zero)."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import encode_jpeg_baseline

    for seed in range(6):
        r = np.random.default_rng(seed)
        w, h = int(r.integers(8, 80)), int(r.integers(8, 60))
        img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rgb = img.tobytes()
        want = decode_image_real(encode_jpeg_baseline(w, h, rgb))
        got = decode_image_real(
            encode_jpeg_baseline(w, h, rgb, interleave=False)
        )
        assert got == want, (seed, w, h)


def test_jpeg_baseline_restart_markers():
    """DRI/RSTn in a BASELINE scan: decoder must byte-realign and
    reset DC predictors at every restart boundary — intervals that
    land mid-row, every MCU, and off-phase all reproduce the
    unrestarted pixels exactly."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import encode_jpeg_baseline

    for seed in (1, 4):
        r = np.random.default_rng(seed)
        w, h = int(r.integers(16, 64)), int(r.integers(16, 48))
        img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rgb = img.tobytes()
        want = decode_image_real(encode_jpeg_baseline(w, h, rgb))
        for ri in (1, 3, 7):
            got = decode_image_real(
                encode_jpeg_baseline(w, h, rgb, restart_interval=ri)
            )
            assert got == want, (seed, w, h, ri)


def test_jpeg_baseline_multi_scan_with_restarts():
    """Combined path: per-component scans AND restart markers (restart
    counts blocks in a non-interleaved scan) still pixel-match the
    plain interleaved stream."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import encode_jpeg_baseline

    r = np.random.default_rng(7)
    w, h = 40, 33
    img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    rgb = img.tobytes()
    want = decode_image_real(encode_jpeg_baseline(w, h, rgb))
    for ri in (2, 5):
        got = decode_image_real(
            encode_jpeg_baseline(w, h, rgb, interleave=False, restart_interval=ri)
        )
        assert got == want, ri


class _CodePacker:
    """Hand-pack an LZW code stream at explicit widths (LSB-first per
    the GIF spec) — lets tests pin the DECODER against the spec
    directly, independent of our encoder."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code, width):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def test_gif_lzw_decoder_spec_dict_growth_and_self_reference():
    """Spec-pinned stream (min code size 2, clear=4, end=5): after
    CLEAR, codes 1,2 build entry 6='12'; code 6 exercises a dict HIT;
    then c == next_code (8) exercises the self-reference case
    (prev + prev[0]). Widths stay 3 bits (next_code < 8 throughout
    reads)."""
    from firefly_vcut_spark.operators.multimodal import _gif_lzw_decode

    p = _CodePacker()
    p.put(4, 3)  # CLEAR
    p.put(1, 3)  # '1'
    p.put(2, 3)  # '2'        → adds 6='12'
    p.put(6, 3)  # '12'       → adds 7='21'  (dict hit)
    # next read is at width 4: the add of 7 made next_code == 8
    p.put(8, 4)  # self-ref: prev='12' → '121', adds 8='121'
    p.put(5, 4)  # END
    out = _gif_lzw_decode(p.bytes(), 2, 100)
    assert out == bytes([1, 2, 1, 2, 1, 2, 1])


def test_gif_lzw_decoder_width_grows_at_table_size():
    """The width bump must happen exactly when the table reaches
    1<<width: with min code size 2 (next_code starts at 6), the
    second add lands next_code on 8 → the FOLLOWING code is read at
    4 bits."""
    from firefly_vcut_spark.operators.multimodal import _gif_lzw_decode

    p = _CodePacker()
    p.put(4, 3)  # CLEAR
    p.put(0, 3)
    p.put(1, 3)  # adds 6
    p.put(2, 3)  # adds 7 → next_code == 8 → width 4 from here
    p.put(3, 4)
    p.put(5, 4)  # END
    assert _gif_lzw_decode(p.bytes(), 2, 10) == bytes([0, 1, 2, 3])


def test_gif_roundtrip_palette_and_interlace():
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    for seed, (w, h), ncol in ((0, (17, 13), 4), (1, (33, 21), 256)):
        r = np.random.default_rng(seed)
        lut = r.integers(0, 256, (ncol, 3)).astype(np.uint8)
        img = lut[r.integers(0, ncol, (h, w))]
        rgb = img.tobytes()
        assert _decode_gif(encode_gif(w, h, rgb)) == (w, h, 3, rgb)
        assert _decode_gif(encode_gif(w, h, rgb, interlace=True)) == (
            w,
            h,
            3,
            rgb,
        ), "interlace"


def test_gif_lzw_table_full_clear_path():
    """A large 256-color noise image drives the dictionary past 4096
    entries — the encoder must emit CLEAR and both sides must resync
    losslessly."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        _decode_gif,
        _gif_lzw_encode,
        encode_gif,
    )

    r = np.random.default_rng(3)
    w, h = 120, 90
    lut = r.integers(0, 256, (256, 3)).astype(np.uint8)
    img = lut[r.integers(0, 256, (h, w))]
    rgb = img.tobytes()
    # table genuinely fills: the raw code stream must contain a CLEAR
    # beyond the leading one (emitted on reset)
    idx = bytes(r.integers(0, 256, 30000).tolist())
    assert len(_gif_lzw_encode(idx, 8)) > 0
    assert _decode_gif(encode_gif(w, h, rgb)) == (w, h, 3, rgb)


def test_gif_decode_dispatch_and_transparency_composition():
    """decode_image_real sniffs GIF magic; a hand-built GIF with a
    smaller frame at (left, top), a transparency index, and a local
    color table composites onto the background color."""
    import struct as st

    from firefly_vcut_spark.operators.multimodal import (
        _gif_lzw_encode,
        decode_image_real,
    )

    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", 4, 3, 0x80 | 0x01, 1, 0)  # screen 4x3, GCT 4
    out += bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9]
    )  # palette: red, green, blue, grey; bg = index 1 (green)
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 3, 0])  # GCE: transparent idx 3
    out += st.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)  # 2x2 frame at (1,1)
    out.append(2)  # LZW min code size
    lzw = _gif_lzw_encode(bytes([0, 2, 3, 0]), 2)  # red, blue, TRANSP, red
    out.append(len(lzw))
    out += lzw
    out += b"\x00\x3b"
    w, h, c, px = decode_image_real(bytes(out))
    assert (w, h, c) == (4, 3, 3)
    G, R, B = (0, 255, 0), (255, 0, 0), (0, 0, 255)
    want = [
        G, G, G, G,
        G, R, B, G,
        G, G, R, G,  # (2,1) transparent → background green
    ]
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(12)]
    assert got == want


def test_gif_background_from_global_table_not_local():
    """Regression: the background index is defined against the GLOBAL
    color table (GIF89a §18). A frame carrying a LOCAL table shorter
    than bg_idx must not change the background — slicing the local
    table would return <3 bytes and corrupt the canvas length."""
    import struct as st

    from firefly_vcut_spark.operators.multimodal import (
        _gif_lzw_encode,
        decode_image_real,
    )

    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", 3, 2, 0x80 | 0x01, 3, 0)  # screen 3x2, GCT 4, bg=3
    out += bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9]
    )  # GCT: red, green, blue, grey(=bg idx 3)
    # 1x1 frame at (0,0) with a LOCAL 2-color table (bg_idx 3 out of range)
    out += st.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0x80 | 0x00)
    out += bytes([1, 2, 3, 4, 5, 6])  # local table: 2 colors
    out.append(2)
    lzw = _gif_lzw_encode(bytes([1]), 2)
    out.append(len(lzw))
    out += lzw
    out += b"\x00\x3b"
    w, h, c, px = decode_image_real(bytes(out))
    assert (w, h, c) == (3, 2, 3)
    assert len(px) == 3 * 2 * 3
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(6)]
    # pixel (0,0) from the local table; the rest is GCT background grey
    assert got == [(4, 5, 6)] + [(9, 9, 9)] * 5


def test_gif_roundtrip_property():
    """Hypothesis: any small palettized image (any palette size 1-256,
    any dims, interlaced or not) round-trips encode_gif → decode
    losslessly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from firefly_vcut_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    @settings(max_examples=80, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        ncol=st.integers(min_value=1, max_value=256),
        interlace=st.booleans(),
    )
    def roundtrip(seed, w, h, ncol, interlace):
        r = np.random.default_rng(seed)
        lut = r.integers(0, 256, (ncol, 3)).astype(np.uint8)
        rgb = lut[r.integers(0, ncol, (h, w))].tobytes()
        assert _decode_gif(encode_gif(w, h, rgb, interlace=interlace)) == (
            w,
            h,
            3,
            rgb,
        )

    roundtrip()


def test_packbits_roundtrip_property():
    """Hypothesis: arbitrary byte strings round-trip _packbits_encode →
    _packbits_decode, and the encoder never emits the 128 no-op header
    (the regression class: a literal overgrown to 129 bytes by a
    trailing run-of-2 at offset 127 encodes header byte 128, which a
    conforming decoder skips, desyncing everything after it)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from firefly_vcut_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
    )

    # low-alphabet bytes maximize run/literal boundary interleavings
    @settings(max_examples=200, deadline=None)
    @given(data=st.binary(max_size=600).map(lambda b: bytes(v % 4 for v in b)))
    def roundtrip(data):
        enc = _packbits_encode(data)
        assert _packbits_decode(enc, len(data)) == data
        p = 0
        while p < len(enc):
            hdr = enc[p]
            assert hdr != 128
            p += 2 if hdr > 128 else hdr + 2
        assert p == len(enc)

    roundtrip()

    # the exact advice repro: 127 non-repeating bytes then a run of 2
    tail = bytes(range(127)) + b"\xff\xff"
    assert _packbits_decode(_packbits_encode(tail), len(tail)) == tail


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _pack_bits(samples, depth):
    """MSB-first sub-byte packing of one scanline's samples."""
    out = bytearray()
    acc = nb = 0
    for v in samples:
        acc = (acc << depth) | v
        nb += depth
        if nb == 8:
            out.append(acc)
            acc = nb = 0
    if nb:
        out.append(acc << (8 - nb))
    return bytes(out)


def encode_png_general(
    w,
    h,
    samples_rows,
    *,
    ctype,
    depth,
    plte=b"",
    trns=b"",
    interlace=False,
):
    """Hand-rolled spec PNG: any color type / depth, optional Adam7
    (all rows filter 0 — the filter branches are covered by the
    8-bit tests). ``samples_rows`` is h rows of w*ch_raw ints."""
    ch_raw = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]

    def scanline(samples):
        if depth == 8:
            return bytes(samples)
        if depth == 16:
            return b"".join(struct.pack(">H", v) for v in samples)
        return _pack_bits(samples, depth)

    raw = bytearray()
    if not interlace:
        for y in range(h):
            raw += b"\x00" + scanline(samples_rows[y])
    else:
        from firefly_vcut_spark.operators.multimodal import _ADAM7

        for x0, y0, dx, dy in _ADAM7:
            sw = (w - x0 + dx - 1) // dx
            sh = (h - y0 + dy - 1) // dy
            if sw <= 0 or sh <= 0:
                continue
            for sy in range(sh):
                y = y0 + sy * dy
                samples = []
                for sx in range(sw):
                    x = x0 + sx * dx
                    samples += samples_rows[y][x * ch_raw : (x + 1) * ch_raw]
                raw += b"\x00" + scanline(samples)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte:
        out += _png_chunk(b"PLTE", plte)
    if trns:
        out += _png_chunk(b"tRNS", trns)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _png_chunk(b"IEND", b"")


def test_png_palette_with_and_without_trns():
    import numpy as np

    r = np.random.default_rng(2)
    w, h, ncol = 9, 7, 5
    plte = bytes(r.integers(0, 256, 3 * ncol).tolist())
    idx = [[int(v) for v in r.integers(0, ncol, w)] for _ in range(h)]
    blob = encode_png_general(w, h, idx, ctype=3, depth=8, plte=plte)
    gw, gh, gc, px = decode_image_real(blob)
    assert (gw, gh, gc) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            ci = idx[y][x]
            assert px[3 * (y * w + x) : 3 * (y * w + x) + 3] == plte[3 * ci : 3 * ci + 3]
    trns = bytes([10, 200, 255])  # alpha for first 3 entries; rest default 255
    gw, gh, gc, px = decode_image_real(
        encode_png_general(w, h, idx, ctype=3, depth=8, plte=plte, trns=trns)
    )
    assert gc == 4
    for y in range(h):
        for x in range(w):
            ci = idx[y][x]
            a = trns[ci] if ci < 3 else 255
            assert px[4 * (y * w + x) + 3] == a


def test_png_sub_byte_depths_gray_and_palette():
    # 4-bit gray: values scale by 255//15
    w, h = 6, 3
    rows = [[(x + y) % 16 for x in range(w)] for y in range(h)]
    gw, gh, gc, px = decode_image_real(
        encode_png_general(w, h, rows, ctype=0, depth=4)
    )
    assert (gw, gh, gc) == (w, h, 1)
    assert list(px) == [v * 255 // 15 for r_ in rows for v in r_]
    # 2-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    rows = [[(x * y) % 4 for x in range(w)] for y in range(h)]
    gw, gh, gc, px = decode_image_real(
        encode_png_general(w, h, rows, ctype=3, depth=2, plte=plte)
    )
    assert gc == 3
    assert px[:3] == plte[3 * rows[0][0] : 3 * rows[0][0] + 3]


def test_png_16bit_reduces_to_high_byte():
    w, h = 4, 2
    rows = [
        [((x + y * w) * 4096 + 513) % 65536 for x in range(w * 3)]
        for y in range(h)
    ]
    gw, gh, gc, px = decode_image_real(
        encode_png_general(w, h, rows, ctype=2, depth=16)
    )
    assert (gw, gh, gc) == (w, h, 3)
    assert list(px) == [v >> 8 for r_ in rows for v in r_]


def test_png_gray_alpha_channels():
    w, h = 5, 4
    rows = [
        [((x * 7 + y * 31 + c) % 256) for x in range(w) for c in range(2)]
        for y in range(h)
    ]
    gw, gh, gc, px = decode_image_real(
        encode_png_general(w, h, rows, ctype=4, depth=8)
    )
    assert (gw, gh, gc, list(px)) == (w, h, 2, [v for r_ in rows for v in r_])


def test_png_adam7_interlace_roundtrip():
    import numpy as np

    r = np.random.default_rng(9)
    for w, h, ctype, depth in ((13, 11, 2, 8), (9, 5, 0, 4), (8, 8, 6, 8), (3, 2, 2, 8)):
        ch_raw = {0: 1, 2: 3, 6: 4}[ctype]
        maxv = (1 << depth) - 1
        rows = [
            [int(v) for v in r.integers(0, maxv + 1, w * ch_raw)]
            for _ in range(h)
        ]
        blob = encode_png_general(w, h, rows, ctype=ctype, depth=depth, interlace=True)
        want_plain = encode_png_general(w, h, rows, ctype=ctype, depth=depth)
        assert decode_image_real(blob) == decode_image_real(want_plain), (
            w, h, ctype, depth,
        )


def test_tiff_roundtrip_matrix():
    """TIFF: both byte orders × {none, LZW, PackBits} × single/multi
    strip × LZW horizontal-differencing predictor, RGB and gray."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import encode_tiff

    r = np.random.default_rng(5)
    img = r.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    rgb = img.tobytes()
    for comp in (1, 5, 32773):
        for be in (False, True):
            for rps in (None, 4):
                preds = (1, 2) if comp == 5 else (1,)
                for pred in preds:
                    blob = encode_tiff(
                        13, 11, rgb, 3,
                        compression=comp, big_endian=be,
                        rows_per_strip=rps, predictor=pred,
                    )
                    assert decode_image_real(blob) == (13, 11, 3, rgb), (
                        comp, be, rps, pred,
                    )
    gray = r.integers(0, 256, (7, 9)).astype(np.uint8).tobytes()
    for comp in (1, 5, 32773):
        blob = encode_tiff(9, 7, gray, 1, compression=comp)
        assert decode_image_real(blob) == (9, 7, 1, gray)


def test_tiff_lzw_spec_width_schedule():
    """Spec-pinned TIFF LZW: hand-packed MSB-first code stream with
    the EARLY width change — after 253 table adds (table size 511 =
    2^9-1) the very next code must be read at 10 bits."""
    from firefly_vcut_spark.operators.multimodal import _tiff_lzw_decode

    codes = [(256, 9)]  # CLEAR
    # 254 literal codes: 0, 1, 0, 1, ... → adds begin at the 2nd code;
    # after the 254th code the decoder has made 253 adds → table 511
    for i in range(254):
        codes.append((i % 2, 9))
    # early change: THIS code is read at 10 bits
    codes.append((5, 10))
    codes.append((257, 10))  # EOI
    acc = nbits = 0
    out = bytearray()
    for c, wdt in codes:
        acc = (acc << wdt) | c
        nbits += wdt
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    got = _tiff_lzw_decode(bytes(out), 255)
    assert got == bytes([i % 2 for i in range(254)] + [5])


def test_tiff_lzw_table_full_clear_roundtrip():
    """Random data long enough to fill the 12-bit table: the encoder's
    CLEAR reset must keep both sides lossless."""
    import numpy as np

    from firefly_vcut_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    r = np.random.default_rng(8)
    data = bytes(r.integers(0, 256, 40000).tolist())
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_palette_and_whiteiszero():
    """Photometric 3 (16-bit ColorMap → high byte) and 0 (WhiteIsZero
    inverts) paths, via a hand-built IFD."""
    import struct as st

    from firefly_vcut_spark.operators.multimodal import _decode_tiff

    # 3x2 palette image, indices 0..2, colormap reds/greens/blues
    w, h = 3, 2
    idx = bytes([0, 1, 2, 2, 1, 0])
    cmap = (
        [0xFF00, 0x1200, 0x0000]  # R plane (hi bytes FF, 12, 00)
        + [0x0000, 0x3400, 0x0000]  # G
        + [0x0000, 0x5600, 0xAB00]  # B
    )
    e = "<"
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, None), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(idx)), (320, 3, 9, None),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(tags) + 4
    cmap_off = ifd_off + ifd_len
    data_off = cmap_off + 2 * len(cmap)
    ifd = st.pack(e + "H", len(tags))
    for tag, typ, cnt, val in tags:
        if tag == 273:
            ifd += st.pack(e + "HHII", tag, typ, 1, data_off)
        elif tag == 320:
            ifd += st.pack(e + "HHII", tag, typ, cnt, cmap_off)
        elif typ == 3:
            ifd += st.pack(e + "HHI", tag, typ, cnt) + st.pack(e + "HH", val, 0)
        else:
            ifd += st.pack(e + "HHII", tag, typ, cnt, val)
    ifd += st.pack(e + "I", 0)
    blob = (
        st.pack(e + "2sHI", b"II", 42, 8)
        + ifd
        + st.pack(e + "H" * len(cmap), *cmap)
        + idx
    )
    gw, gh, gc, px = _decode_tiff(blob)
    assert (gw, gh, gc) == (w, h, 3)
    assert px[0:3] == bytes([0xFF, 0, 0])
    assert px[3:6] == bytes([0x12, 0x34, 0x56])
    assert px[6:9] == bytes([0, 0, 0xAB])
    # WhiteIsZero gray
    from firefly_vcut_spark.operators.multimodal import encode_tiff

    gray = bytes([0, 128, 255, 7])
    blob = bytearray(encode_tiff(2, 2, gray, 1))
    # photometric tag (262) value: flip 1 → 0 in the IFD entry
    i = blob.find(st.pack("<HH", 262, 3))
    assert i > 0
    st.pack_into("<HH", blob, i + 8, 0, 0)
    gw, gh, gc, px = _decode_tiff(bytes(blob))
    assert list(px) == [255 - v for v in gray]
