"""Generate the committed VP8-lossy parity fixtures in tests/data/vp8/.

Each fixture is a REAL encoder-produced lossy WebP (system libwebp via
ctypes) plus the md5 of the Y/U/V planes that libwebp's own decoder
produces for it.  The committed pair makes tests/test_vp8.py hermetic:
the pure-Python decoder must reproduce the reference decode
pixel-exactly with no codec library present at test time.

The images are deterministic (mgrid gradients + seeded noise), and the
quality ladder is chosen to cover the decoder's branches: q5/q40/q75
carry loop-filter levels up to 63 and segmentation, q99 is
filter-level-0, odd dimensions exercise plane cropping, and the
mixed-content images force B_PRED with the full 4x4 mode palette
alongside 16x16 DC/V/H/TM macroblocks.
"""

from __future__ import annotations

import ctypes
import hashlib
import json
import os
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "data", "vp8")


def load_libwebp():
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def encode(lib, img: np.ndarray, quality: float) -> bytes:
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(img.tobytes(), w, h, w * 3, quality, ctypes.byref(out))
    assert n > 0, "encode failed"
    blob = bytes(bytearray(out[i] for i in range(n)))
    lib.WebPFree(out)
    return blob


def ref_decode(lib, blob: bytes):
    wi = ctypes.c_int()
    hi = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    yptr = lib.WebPDecodeYUV(blob, len(blob), ctypes.byref(wi), ctypes.byref(hi),
                             ctypes.byref(up), ctypes.byref(vp),
                             ctypes.byref(stride), ctypes.byref(uvstride))
    assert yptr, "reference decode failed"
    w, h = wi.value, hi.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.ctypeslib.as_array(yptr, (h, stride.value))[:, :w].copy()
    U = np.ctypeslib.as_array(up, (ch, uvstride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(vp, (ch, uvstride.value))[:, :cw].copy()
    lib.WebPFree(yptr)
    return Y, U, V


def make_image(kind: str, w: int, h: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "flat":
        return np.full((h, w, 3), (90, 140, 200), np.uint8)
    if kind == "grad":
        return np.stack(
            [(xx * 5 + yy * 3) % 256, (xx * 2 + 100) % 256, (yy * 7) % 256], -1
        ).astype(np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    if kind == "mix":
        img = np.stack(
            [(xx * 5 + yy * 3) % 256, (xx * 2 + 100) % 256, (yy * 7) % 256], -1
        ).astype(np.uint8)
        r0, r1, c0, c1 = h // 4, h // 2, w // 4, w // 2
        img[r0:r1, c0:c1] = rng.integers(0, 256, (r1 - r0, c1 - c0, 3))
        return img
    raise ValueError(kind)


FIXTURES = [
    # (name, kind, w, h, quality, seed)
    ("flat_16x16_q75", "flat", 16, 16, 75.0, 0),
    ("grad_48x32_q75", "grad", 48, 32, 75.0, 0),
    ("grad_48x32_q5", "grad", 48, 32, 5.0, 0),   # max loop-filter level
    ("noise_32x32_q40", "noise", 32, 32, 40.0, 7),
    ("noise_32x32_q99", "noise", 32, 32, 99.0, 7),  # filter level 0
    ("mix_80x48_q75", "mix", 80, 48, 75.0, 3),   # B_PRED full mode palette
    ("mix_80x48_q99", "mix", 80, 48, 99.0, 3),
    ("grad_33x17_q75", "grad", 33, 17, 75.0, 0),  # odd dims, crop path
    ("grad_128x96_q60", "grad", 128, 96, 60.0, 0),
]


# VP8X + ALPH fixtures: RGBA encodes (libwebp picks VP8L-compressed
# alpha for smooth planes and raw for noise); manifest carries the
# ALPHA channel md5 from libwebp's own RGBA decode alongside the YUV
# md5s of the color frame
ALPHA_FIXTURES = [
    ("rgba_48x32_q75_gradalpha", 48, 32, 75.0, "grad"),
    ("rgba_64x48_q60_noisealpha", 64, 48, 60.0, "noise"),
]


def encode_rgba(lib, img: np.ndarray, quality: float) -> bytes:
    import ctypes as C

    lib.WebPEncodeRGBA.restype = C.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        C.c_char_p, C.c_int, C.c_int, C.c_int,
        C.c_float, C.POINTER(C.POINTER(C.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = C.POINTER(C.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        C.c_char_p, C.c_size_t, C.POINTER(C.c_int), C.POINTER(C.c_int),
    ]
    h, w, _ = img.shape
    out = C.POINTER(C.c_uint8)()
    n = lib.WebPEncodeRGBA(img.tobytes(), w, h, w * 4, quality, C.byref(out))
    assert n > 0
    blob = bytes(bytearray(out[i] for i in range(n)))
    lib.WebPFree(out)
    return blob


def ref_decode_rgba(lib, blob: bytes):
    import ctypes as C

    wi = C.c_int()
    hi = C.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), C.byref(wi), C.byref(hi))
    assert p
    arr = np.ctypeslib.as_array(p, (hi.value, wi.value, 4)).copy()
    lib.WebPFree(p)
    return arr


def adv_encode(lib, img: np.ndarray, **overrides) -> bytes:
    """Advanced-API encode (WebPConfig + WebPPicture via ctypes struct
    offsets) to reach streams the simple API never emits: the SIMPLE
    loop filter and nonzero sharpness.  The config layout is verified
    against the library's own defaults fingerprint before poking; the
    picture layout is verified by the y-plane pointer ImportRGB fills.
    (config.partitions is accepted but ignored by this libwebp, so
    multi-partition token streams remain unreachable by any encoder in
    this environment — that decoder path is spec-only.)"""
    import ctypes as C
    import struct as S

    ABI = 0x20F
    cfg = (C.c_uint8 * 512)()
    assert lib.WebPConfigInitInternal(cfg, 0, C.c_float(75.0), ABI)
    expect = S.unpack_from("<i f 7i", bytes(cfg), 0)
    assert expect == (0, 75.0, 4, 0, 0, 0, 4, 50, 60), (
        "WebPConfig layout changed — refusing to poke fields blindly"
    )
    off = {"filter_strength": 32, "filter_sharpness": 36, "filter_type": 40,
           "segments": 24, "partitions": 72}
    for k, v in overrides.items():
        S.pack_into("<i", cfg, off[k], v)
    assert lib.WebPValidateConfig(cfg)

    h, w, _ = img.shape
    pic = (C.c_uint8 * 512)()
    assert lib.WebPPictureInitInternal(pic, ABI)
    S.pack_into("<i", pic, 8, w)
    S.pack_into("<i", pic, 12, h)
    assert lib.WebPPictureImportRGB(pic, img.tobytes(), w * 3)
    assert S.unpack_from("<Q", pic, 16)[0] != 0, "WebPPicture layout changed"
    writer = (C.c_uint8 * 32)()
    lib.WebPMemoryWriterInit(writer)
    S.pack_into("<Q", pic, 96, C.cast(lib.WebPMemoryWrite, C.c_void_p).value)
    S.pack_into("<Q", pic, 104, C.addressof(writer))
    assert lib.WebPEncode(cfg, pic), "advanced encode failed"
    mem, size = S.unpack_from("<QQ", bytes(writer), 0)
    blob = C.string_at(mem, size)
    lib.WebPPictureFree(pic)
    lib.WebPMemoryWriterClear(writer)
    return blob


# advanced-API fixtures: (name, w, h, config overrides)
ADV_FIXTURES = [
    # config filter_type 0 = SIMPLE loop filter in the bitstream
    ("mix_96x80_simplefilter", 96, 80,
     {"filter_type": 0, "filter_strength": 100, "filter_sharpness": 5}),
    # normal filter with nonzero sharpness (shrinks the interior limit)
    ("mix_96x80_sharp", 96, 80,
     {"filter_type": 1, "filter_strength": 100, "filter_sharpness": 3}),
]


def main() -> None:
    lib = load_libwebp()
    os.makedirs(OUT_DIR, exist_ok=True)
    manifest = {}
    for name, kind, w, h, q, seed in FIXTURES:
        img = make_image(kind, w, h, seed)
        blob = encode(lib, img, q)
        Y, U, V = ref_decode(lib, blob)
        path = os.path.join(OUT_DIR, name + ".webp")
        with open(path, "wb") as f:
            f.write(blob)
        manifest[name] = {
            "width": int(w),
            "height": int(h),
            "quality": q,
            "bytes": len(blob),
            "md5_y": hashlib.md5(Y.tobytes()).hexdigest(),
            "md5_u": hashlib.md5(U.tobytes()).hexdigest(),
            "md5_v": hashlib.md5(V.tobytes()).hexdigest(),
        }
        print(f"{name}: {len(blob)} bytes", file=sys.stderr)
    for name, w, h, q, alpha_kind in ALPHA_FIXTURES:
        rng = np.random.default_rng(11)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.zeros((h, w, 4), np.uint8)
        img[..., 0] = (xx * 5) % 256
        img[..., 1] = (yy * 7) % 256
        img[..., 2] = 128
        if alpha_kind == "grad":
            img[..., 3] = (xx * 3 + yy * 2) % 256
        else:
            img[..., 3] = rng.integers(0, 256, (h, w))
        blob = encode_rgba(lib, img, q)
        assert blob[12:16] == b"VP8X", "expected an extended container"
        rgba = ref_decode_rgba(lib, blob)
        Y, U, V = ref_decode(lib, blob)
        with open(os.path.join(OUT_DIR, name + ".webp"), "wb") as f:
            f.write(blob)
        manifest[name] = {
            "width": int(w),
            "height": int(h),
            "quality": q,
            "bytes": len(blob),
            "md5_y": hashlib.md5(Y.tobytes()).hexdigest(),
            "md5_u": hashlib.md5(U.tobytes()).hexdigest(),
            "md5_v": hashlib.md5(V.tobytes()).hexdigest(),
            "md5_alpha": hashlib.md5(
                np.ascontiguousarray(rgba[..., 3]).tobytes()
            ).hexdigest(),
        }
        print(f"{name}: {len(blob)} bytes (VP8X)", file=sys.stderr)
    for name, w, h, overrides in ADV_FIXTURES:
        rng = np.random.default_rng(2)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 5 + yy * 3) % 256, (xx * 2 + 100) % 256, (yy * 7) % 256], -1
        ).astype(np.uint8)
        img[16:64, 20:60] = rng.integers(0, 256, (48, 40, 3))
        blob = adv_encode(lib, img, **overrides)
        Y, U, V = ref_decode(lib, blob)
        with open(os.path.join(OUT_DIR, name + ".webp"), "wb") as f:
            f.write(blob)
        manifest[name] = {
            "width": int(w),
            "height": int(h),
            "quality": 75.0,
            "bytes": len(blob),
            "md5_y": hashlib.md5(Y.tobytes()).hexdigest(),
            "md5_u": hashlib.md5(U.tobytes()).hexdigest(),
            "md5_v": hashlib.md5(V.tobytes()).hexdigest(),
        }
        print(f"{name}: {len(blob)} bytes (advanced)", file=sys.stderr)
    with open(os.path.join(OUT_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    print(f"wrote {len(manifest)} fixtures to {OUT_DIR}", file=sys.stderr)
    _emit_fixture_module(lib, manifest)


def _emit_fixture_module(lib, manifest) -> None:
    """Emit operators/vp8_fixture_data.py: the committed blobs as
    base64 plus LIBWEBP-DERIVED truth rows (dims, plane md5s, alpha
    md5, mean luma).  The registry query mm_vp8_lossy_decode decodes
    the blobs with the from-scratch decoder and its DuckDB oracle
    asserts these recorded constants — external ground truth from the
    reference codec, not a self-roundtrip."""
    import base64

    out_path = os.path.join(
        os.path.dirname(OUT_DIR.rstrip("/")), "..",
        "firefly_vcut_spark", "operators", "vp8_fixture_data.py",
    )
    out_path = os.path.normpath(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "firefly_vcut_spark", "operators", "vp8_fixture_data.py"))
    rows = []
    blobs = {}
    for name in sorted(manifest):
        with open(os.path.join(OUT_DIR, name + ".webp"), "rb") as f:
            blob = f.read()
        blobs[name] = base64.b64encode(blob).decode()
        Y, U, V = ref_decode(lib, blob)
        if blob[12:16] == b"VP8X":
            rgba = ref_decode_rgba(lib, blob)
            alpha_md5 = hashlib.md5(
                np.ascontiguousarray(rgba[..., 3]).tobytes()
            ).hexdigest()
        else:
            alpha_md5 = ""
        rows.append({
            "name": name,
            "width": manifest[name]["width"],
            "height": manifest[name]["height"],
            "y_md5": hashlib.md5(Y.tobytes()).hexdigest(),
            "u_md5": hashlib.md5(U.tobytes()).hexdigest(),
            "v_md5": hashlib.md5(V.tobytes()).hexdigest(),
            "alpha_md5": alpha_md5,
            "mean_y": round(float(Y.astype(np.float64).mean()), 6),
        })
    with open(out_path, "w") as f:
        f.write('"""GENERATED by tools/gen_vp8_fixtures.py — committed real\n'
                "libwebp-ENCODED lossy/extended WebP blobs (base64) plus the\n"
                "truth rows libwebp's own DECODER produces for them (plane\n"
                "md5s, alpha md5, mean luma). mm_vp8_lossy_decode decodes the\n"
                "blobs with the from-scratch VP8 decoder (operators/vp8.py)\n"
                "and its oracle asserts these constants: external reference-\n"
                'codec truth, not a self-roundtrip. Do not edit by hand."""\n\n'
                "BLOBS_B64 = {\n")
        for name, b64 in blobs.items():
            f.write(f'    "{name}": (\n')
            for i in range(0, len(b64), 68):
                f.write(f'        "{b64[i:i+68]}"\n')
            f.write("    ),\n")
        f.write("}\n\nTRUTH_ROWS = [\n")
        for r in rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(f"wrote {out_path} ({len(rows)} truth rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
