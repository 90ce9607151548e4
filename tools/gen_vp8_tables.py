"""Regenerate ``firefly_vcut_spark/operators/vp8_tables.py`` — the RFC 6386
constant tables the from-scratch VP8 keyframe decoder needs.

The tables (default/update token probabilities, keyframe B-mode
probabilities, quantizer lookups, coefficient band map, zigzag order)
are constants of the PUBLIC VP8 specification (RFC 6386 sections 13-14).
This environment has no copy of the RFC text, but it does ship a
conformant implementation — the system libwebp shared library — whose
read-only data section carries the spec tables verbatim.  This tool
locates them by value signatures (several short spec constants are
known a priori and act as anchors: the category-6 extra-bit
probabilities, the first keyframe B-mode probability row, the
coefficient band map, the zigzag order), checks that the encoder- and
decoder-side copies inside the library agree, and emits them as a
Python module.

The recovered values are then independently validated end-to-end: the
pure-Python decoder built on them must reproduce libwebp's own decode
PIXEL-EXACTLY on real encoder-produced streams (tests/test_vp8.py) —
a single wrong byte in the probability tables desynchronizes the
boolean decoder and fails that parity, so the committed tables are
proven, not trusted.

Usage: python tools/gen_vp8_tables.py [path-to-libwebp.so] > /dev/null
(writes the module in place; prints a summary to stderr).
"""

from __future__ import annotations

import re
import struct
import sys

OUT = "firefly_vcut_spark/operators/vp8_tables.py"

# spec constants known a priori, used as search anchors
CAT6_PROBS = bytes([254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129])
KF_BMODE_00 = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
BANDS = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
ZIGZAG = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])


def find_all(data: bytes, needle: bytes) -> list[int]:
    return [m.start() for m in re.finditer(re.escape(needle), data)]


def find_ac_qlookup(data: bytes) -> int:
    """uint16[128], nondecreasing, 4..284."""
    hits = []
    for off in range(0, len(data) - 256, 2):
        if data[off] != 4 or data[off + 1] != 0:
            continue
        vals = struct.unpack_from("<128H", data, off)
        if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] == 284:
            hits.append(off)
    if not hits:
        raise SystemExit("ac_qlookup not found")
    return hits[0]


def find_dc_qlookup(data: bytes) -> int:
    """uint8[128], nondecreasing, 4..157."""
    for off in range(0, len(data) - 128):
        if data[off] != 4 or data[off + 127] != 157:
            continue
        vals = data[off:off + 128]
        if all(vals[i] <= vals[i + 1] for i in range(127)):
            return off
    raise SystemExit("dc_qlookup not found")


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    import ctypes.util
    import os

    if not os.path.exists(so):
        real = ctypes.util.find_library("webp")
        if not real:
            raise SystemExit("libwebp not found on this system")
        so = real
    data = open(so, "rb").read()

    bmode_hits = find_all(data, KF_BMODE_00)
    if len(bmode_hits) < 1:
        raise SystemExit("kf_bmode anchor not found")
    # decoder-side copy is the first occurrence; the encoder carries its own
    kf_bmode_off = bmode_hits[0]
    kf_bmode_raw = data[kf_bmode_off:kf_bmode_off + 900]
    if len(bmode_hits) > 1:
        other = data[bmode_hits[1]:bmode_hits[1] + 900]
        assert other == kf_bmode_raw, "enc/dec kf_bmode copies disagree"
    # libwebp lays the [above][left] context rows out in ITS B-mode
    # numbering (DC,TM,VE,HE,RD,VR,LD,VL,HD,HU — read off its bmode tree
    # at kYModesIntra4, where node5 holds modes (4,5) and node6's left
    # leaf is 6), which permutes RD/VR/LD relative to the RFC 6386 order
    # (DC,TM,VE,HE,LD,RD,VR,VL,HD,HU) this decoder uses.  Index drift
    # here is the nastiest bug class in VP8: the arithmetic-decoder
    # STATE depends on the probabilities even when every decoded symbol
    # matches, so a wrong context row desyncs the stream only much
    # later.  Permute to RFC order at extraction time.
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # rfc index -> libwebp index
    kf_bmode = bytearray(900)
    for a in range(10):
        for l in range(10):
            src = (perm[a] * 10 + perm[l]) * 9
            dst = (a * 10 + l) * 9
            kf_bmode[dst:dst + 9] = kf_bmode_raw[src:src + 9]
    kf_bmode = bytes(kf_bmode)

    # coeff_update_probs: the 1056 bytes immediately preceding kf_bmode
    update_off = kf_bmode_off - 1056
    update = data[update_off:update_off + 1056]
    assert update[:11] == b"\xff" * 11, "update-probs head not 255s"
    assert sum(1 for b in update if b == 0xFF) > 800, "update-probs not FF-dominated"
    assert all(b >= 1 for b in update), "probability 0 is spec-illegal"

    # default_coeff_probs: 1056 bytes; [0][1][0] begins with a distinctive
    # signature; [0][0] is a 33-byte 128 run before it
    sig = bytes([253, 136, 254, 255, 228, 219])
    dhits = find_all(data, sig)
    assert dhits, "default-coeff-probs signature not found"
    default_off = dhits[0] - 33
    default = data[default_off:default_off + 1056]
    assert default[:33] == b"\x80" * 33, "default-probs [0][0] not 128s"
    assert all(b >= 1 for b in default), "probability 0 is spec-illegal"
    if len(dhits) > 1:
        other = data[dhits[1] - 33:dhits[1] - 33 + 1056]
        assert other == default, "enc/dec default-coeff-probs copies disagree"

    ac_off = find_ac_qlookup(data)
    ac_q = struct.unpack_from("<128H", data, ac_off)
    dc_off = find_dc_qlookup(data)
    dc_q = list(data[dc_off:dc_off + 128])

    assert find_all(data, BANDS), "band map not present"
    assert find_all(data, ZIGZAG), "zigzag not present"

    def fmt(name: str, vals, per=16) -> str:
        lines = [f"{name} = ["]
        vals = list(vals)
        for i in range(0, len(vals), per):
            lines.append("    " + ", ".join(str(v) for v in vals[i:i + per]) + ",")
        lines.append("]")
        return "\n".join(lines)

    body = f'''"""RFC 6386 (VP8) constant tables — GENERATED by tools/gen_vp8_tables.py.

These are constants of the public VP8 bitstream specification
(RFC 6386 sections 13-14): token-probability defaults and update
probabilities, keyframe B-mode probabilities, quantizer lookups, the
coefficient band map, and the zigzag scan order.  They were recovered
from the read-only data of the system libwebp (a conformant
implementation) by value-signature search with encoder/decoder
cross-copy verification, and are independently PROVEN by the
pixel-exact decode parity suite in tests/test_vp8.py: a single wrong
byte here desynchronizes the boolean decoder against real
libwebp-encoded streams.

Do not edit by hand; rerun the generator.
"""

# dequantization lookups, indexed by clamped quantizer index 0..127
{fmt("DC_QLOOKUP", dc_q)}

{fmt("AC_QLOOKUP", ac_q)}

# coefficient position -> probability band (RFC 6386 13.3)
COEFF_BANDS = {list(BANDS)}

# zigzag: coefficient order -> raster position in the 4x4 block
ZIGZAG = {list(ZIGZAG)}

# token probabilities [block_type=4][band=8][context=3][node=11], flattened
{fmt("DEFAULT_COEFF_PROBS_FLAT", default)}

# header-update probabilities, same shape, flattened
{fmt("COEFF_UPDATE_PROBS_FLAT", update)}

# keyframe B-mode probabilities [above=10][left=10][node=9], flattened
{fmt("KF_BMODE_PROBS_FLAT", kf_bmode)}

# keyframe 16x16 luma-mode / chroma-mode tree probabilities (RFC 6386 11.2;
# present as code immediates, not data, in libwebp — values proven by the
# same decode-parity suite)
KF_YMODE_PROBS = [145, 156, 163, 128]
KF_UV_MODE_PROBS = [142, 114, 183]

# extra-bit probabilities for dct_cat1..6 (RFC 6386 13.2)
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASES = [5, 7, 11, 19, 35, 67]
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(
        f"wrote {OUT}: dc_q@{hex(dc_off)} ac_q@{hex(ac_off)} "
        f"update@{hex(update_off)} default@{hex(default_off)} "
        f"kf_bmode@{hex(kf_bmode_off)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
