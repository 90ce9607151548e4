"""From-scratch VP8 keyframe (intra) decoder — pure stdlib + the RFC 6386
constant tables in ``vp8_tables.py``.

Closes the WebP-lossy codec guard left declared in ``webp.decode_vp8l``
(r10 verdict task 6): lossy WebP stills are VP8 keyframes, and this
module decodes them for real — boolean arithmetic decoder, full frame
header (segmentation, loop-filter deltas, quantizer indices, token
probability updates), per-macroblock intra mode parse (16x16 modes and
all ten 4x4 B_PRED modes with keyframe context trees), token/coefficient
decode over multiple DCT partitions, dequantization, inverse WHT + DCT,
intra prediction with the spec border conventions, and both loop
filters (normal six-tap and simple).

Correctness is proven against real encoders, not self-roundtrips: the
parity suite (tests/test_vp8.py) decodes libwebp-ENCODED streams and
requires our Y/U/V planes to equal libwebp's own decode PIXEL-EXACTLY.
A single wrong probability byte, filter tap, or border pixel fails it.
(One caveat, declared: no encoder in this environment emits more than
one token partition — libwebp ignores config.partitions — so the
multi-partition path, three lines of size-parse plus mb_row%nparts
partition selection, is spec-conformant but untested on real streams.)

The extended container (VP8X) still path decodes too:
``decode_webp_extended`` handles the ALPH alpha plane (raw or
headerless-VP8L-compressed, all four prediction filters — see
``webp.decode_alpha_plane``) over a VP8 keyframe or a VP8L chunk,
validated byte-exactly against libwebp's RGBA decode including a
real-world in-the-wild file. The remaining boundary: animated WebP
(ANIM/ANMF) and VP8 inter frames generally.

Reference analog: none (the reference pipeline has no image path;
SURVEY §2 extensions). Spec: RFC 6386 sections 7-15.
"""

from __future__ import annotations

import struct

from firefly_vcut_spark.operators.vp8_tables import (
    AC_QLOOKUP,
    CAT_BASES,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS_FLAT,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS_FLAT,
    KF_BMODE_PROBS_FLAT,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

# ------------------------------------------------------------------ trees

# 16x16 luma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]

# 4x4 modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
# 16x16 mode -> implicit 4x4 mode for B_PRED context (RFC 6386 11.3)
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

# coefficient tokens
(ZERO_TOKEN, ONE_TOKEN, TWO_TOKEN, THREE_TOKEN, FOUR_TOKEN,
 CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, EOB_TOKEN) = range(12)
COEFF_TREE = [
    -EOB_TOKEN, 2,
    -ZERO_TOKEN, 4,
    -ONE_TOKEN, 6,
    8, 12,
    -TWO_TOKEN, 10,
    -THREE_TOKEN, -FOUR_TOKEN,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
]


def _unflatten_coeff(flat):
    """[4][8][3][11] nested lists from the flat table."""
    it = iter(flat)
    return [[[[next(it) for _ in range(11)] for _ in range(3)]
             for _ in range(8)] for _ in range(4)]


def _unflatten_bmode(flat):
    it = iter(flat)
    return [[[next(it) for _ in range(9)] for _ in range(10)]
            for _ in range(10)]


DEFAULT_COEFF_PROBS = _unflatten_coeff(DEFAULT_COEFF_PROBS_FLAT)
COEFF_UPDATE_PROBS = _unflatten_coeff(COEFF_UPDATE_PROBS_FLAT)
KF_BMODE_PROBS = _unflatten_bmode(KF_BMODE_PROBS_FLAT)

# --------------------------------------------------------------- bool dec


class BoolDecoder:
    """RFC 6386 section 7 boolean arithmetic decoder (reads 0 past end)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= nxt
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _maybe_signed(bd: BoolDecoder, n: int) -> int:
    """flag -> signed literal, else 0 (the header's optional-delta shape)."""
    return bd.signed_literal(n) if bd.bit() else 0


# -------------------------------------------------------------- transforms


def iwht4x4(ip):
    """Inverse Walsh-Hadamard for the Y2 block (RFC 6386 14.3)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468  # sin(pi/8)*sqrt(2), Q16


def idct4x4(ip):
    """RFC 6386 14.4 inverse DCT; returns 16 residuals (no +4>>3 yet
    applied in pass 1, applied in pass 2 per spec)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# ------------------------------------------------------------- frame state


class _Header:
    """Parsed keyframe header fields (attribute bag filled by
    _parse_header; see RFC 6386 section 9 for the field inventory)."""


def _parse_header(bd: BoolDecoder) -> _Header:
    """Keyframe header, RFC 6386 section 9 (after the uncompressed tag)."""
    h = _Header()
    h.color_space = bd.literal(1)
    h.clamping = bd.literal(1)

    h.seg_enabled = bd.literal(1)
    h.update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            h.seg_abs = bd.literal(1)
            h.seg_quant = [_maybe_signed(bd, 7) for _ in range(4)]
            h.seg_lf = [_maybe_signed(bd, 6) for _ in range(4)]
        if h.update_map:
            h.seg_tree_probs = [
                bd.literal(8) if bd.bit() else 255 for _ in range(3)
            ]

    h.filter_type = bd.literal(1)  # 0 = normal, 1 = simple
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.literal(1)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.literal(1):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bit():
                    h.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit():
                    h.mode_lf_deltas[i] = bd.signed_literal(6)

    h.nparts = 1 << bd.literal(2)

    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = _maybe_signed(bd, 4)
    h.y2_dc_delta = _maybe_signed(bd, 4)
    h.y2_ac_delta = _maybe_signed(bd, 4)
    h.uv_dc_delta = _maybe_signed(bd, 4)
    h.uv_ac_delta = _maybe_signed(bd, 4)

    h.refresh_entropy = bd.literal(1)

    # deep-copy defaults then apply header updates
    h.coeff_probs = [
        [[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
         for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    if bd.bit(COEFF_UPDATE_PROBS[t][b][c][n]):
                        h.coeff_probs[t][b][c][n] = bd.literal(8)

    h.mb_no_skip = bd.literal(1)
    h.prob_skip_false = bd.literal(8) if h.mb_no_skip else 0
    return h


def _segment_dequants(h: _Header):
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac)."""
    out = []
    for seg in range(4):
        if h.seg_enabled:
            qi = h.seg_quant[seg] if h.seg_abs else h.y_ac_qi + h.seg_quant[seg]
        else:
            qi = h.y_ac_qi
        qi = max(0, min(127, qi))

        def dc(delta):
            return DC_QLOOKUP[max(0, min(127, qi + delta))]

        def ac(delta):
            return AC_QLOOKUP[max(0, min(127, qi + delta))]

        y1dc = dc(h.y_dc_delta)
        y1ac = ac(0)
        y2dc = dc(h.y2_dc_delta) * 2
        y2ac = max(8, ac(h.y2_ac_delta) * 155 // 100)
        uvdc = min(132, dc(h.uv_dc_delta))
        uvac = ac(h.uv_ac_delta)
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# --------------------------------------------------------- token decoding


def _decode_block(bd, probs, first, ctx, dqdc, dqac):
    """One 4x4 block's tokens; returns (coeffs raster[16], nonzero)."""
    coeffs = [0] * 16
    n = first
    nonzero = False
    start = 0  # tree start index; 2 skips the EOB branch after a ZERO
    while n < 16:
        p = probs[COEFF_BANDS[n]][ctx]
        token = bd.tree(COEFF_TREE, p, start)
        if token == EOB_TOKEN:
            break
        if token == ZERO_TOKEN:
            ctx = 0
            start = 2
            n += 1
            continue
        if token == ONE_TOKEN:
            val = 1
            ctx = 1
        else:
            if token <= FOUR_TOKEN:
                val = token  # TWO/THREE/FOUR tokens carry their value
            else:
                cat = token - CAT1
                extra = 0
                for pb in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.bit(pb)
                val = CAT_BASES[cat] + extra
            ctx = 2
        if bd.bit():
            val = -val
        coeffs[ZIGZAG[n]] = val * (dqdc if n == 0 else dqac)
        nonzero = True
        start = 0
        n += 1
    return coeffs, nonzero


# ---------------------------------------------------------- intra predict


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


class _Plane:
    """A reconstructed plane with the RFC 6386 border conventions: the
    row above the frame reads 127, the column left of the frame reads
    129, the above-left corner follows the above row on the top edge
    and the left column otherwise; pixels beyond the right edge of an
    interior row replicate that row's last pixel (border extension)."""

    __slots__ = ("w", "h", "px", "top")

    def __init__(self, w: int, h: int, top: int = 127):
        self.w = w
        self.h = h
        self.top = top
        self.px = bytearray(w * h)

    def get(self, y: int, x: int) -> int:
        if y < 0:
            return self.top
        if x < 0:
            return 129
        if x >= self.w:
            x = self.w - 1
        return self.px[y * self.w + x]

    def corner(self, y: int, x: int) -> int:
        """Above-left pixel for a block whose top-left is (y, x)."""
        if y == 0:
            return self.top
        if x == 0:
            return 129
        return self.px[(y - 1) * self.w + (x - 1)]

    def row(self, y: int, x: int, n: int):
        """n pixels of the row above (y-1) starting at x, border rules."""
        return [self.get(y - 1, x + i) for i in range(n)]

    def col(self, y: int, x: int, n: int):
        """n pixels of the column left (x-1) starting at y."""
        return [129] * n if x == 0 else [
            self.get(y + i, x - 1) for i in range(n)
        ]

    def put_block(self, y: int, x: int, size: int, vals):
        for r in range(size):
            base = (y + r) * self.w + x
            row = vals[r]
            for c in range(size):
                self.px[base + c] = row[c]


def _pred_dc(plane, y, x, size):
    up = y > 0
    left = x > 0
    if up and left:
        s = sum(plane.row(y, x, size)) + sum(plane.col(y, x, size))
        shift = 5 if size == 16 else 4
        dc = (s + size) >> shift
    elif up:
        s = sum(plane.row(y, x, size))
        dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
    elif left:
        s = sum(plane.col(y, x, size))
        dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return [[dc] * size for _ in range(size)]


def _pred_v(plane, y, x, size):
    a = plane.row(y, x, size)
    return [a[:] for _ in range(size)]


def _pred_h(plane, y, x, size):
    lcol = plane.col(y, x, size)
    return [[lcol[r]] * size for r in range(size)]


def _pred_tm(plane, y, x, size):
    a = plane.row(y, x, size)
    lcol = plane.col(y, x, size)
    p = plane.corner(y, x)
    return [
        [_clamp255(lcol[r] + a[c] - p) for c in range(size)]
        for r in range(size)
    ]


_PRED16 = {DC_PRED: _pred_dc, V_PRED: _pred_v, H_PRED: _pred_h,
           TM_PRED: _pred_tm}


def _pred_b(mode, above8, left4, tl):
    """4x4 intra prediction. above8 = 4 above + 4 above-right pixels,
    left4 = 4 left pixels, tl = above-left. RFC 6386 12.3."""
    d = [[0] * 4 for _ in range(4)]
    A = above8
    L = left4
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                d[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                d[r][c] = _clamp255(L[r] + A[c] - tl)
    elif mode == B_VE:
        ap = [
            _avg3(tl, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        for r in range(4):
            d[r] = ap[:]
    elif mode == B_HE:
        lp = [
            _avg3(tl, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        for r in range(4):
            d[r] = [lp[r]] * 4
    elif mode == B_LD:
        p = A
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    d[r][c] = _avg3(p[i], p[i + 1], p[i + 2])
                else:
                    d[r][c] = _avg3(p[6], p[7], p[7])
    elif mode == B_RD:
        p = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                d[r][c] = _avg3(p[i], p[i + 1], p[i + 2])
    elif mode == B_VR:
        p = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
        d[3][0] = _avg3(p[1], p[2], p[3])
        d[2][0] = _avg3(p[2], p[3], p[4])
        d[3][1] = d[1][0] = _avg3(p[3], p[4], p[5])
        d[2][1] = d[0][0] = _avg2(p[4], p[5])
        d[3][2] = d[1][1] = _avg3(p[4], p[5], p[6])
        d[2][2] = d[0][1] = _avg2(p[5], p[6])
        d[3][3] = d[1][2] = _avg3(p[5], p[6], p[7])
        d[2][3] = d[0][2] = _avg2(p[6], p[7])
        d[1][3] = _avg3(p[6], p[7], p[8])
        d[0][3] = _avg2(p[7], p[8])
    elif mode == B_VL:
        p = A
        d[0][0] = _avg2(p[0], p[1])
        d[1][0] = _avg3(p[0], p[1], p[2])
        d[2][0] = d[0][1] = _avg2(p[1], p[2])
        d[1][1] = d[3][0] = _avg3(p[1], p[2], p[3])
        d[2][1] = d[0][2] = _avg2(p[2], p[3])
        d[3][1] = d[1][2] = _avg3(p[2], p[3], p[4])
        d[2][2] = d[0][3] = _avg2(p[3], p[4])
        d[3][2] = d[1][3] = _avg3(p[3], p[4], p[5])
        d[2][3] = _avg3(p[4], p[5], p[6])
        d[3][3] = _avg3(p[5], p[6], p[7])
    elif mode == B_HD:
        p = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2]]
        d[3][0] = _avg2(p[0], p[1])
        d[3][1] = _avg3(p[0], p[1], p[2])
        d[2][0] = d[3][2] = _avg2(p[1], p[2])
        d[2][1] = d[3][3] = _avg3(p[1], p[2], p[3])
        d[2][2] = d[1][0] = _avg2(p[2], p[3])
        d[2][3] = d[1][1] = _avg3(p[2], p[3], p[4])
        d[1][2] = d[0][0] = _avg2(p[3], p[4])
        d[1][3] = d[0][1] = _avg3(p[3], p[4], p[5])
        d[0][2] = _avg3(p[4], p[5], p[6])
        d[0][3] = _avg3(p[5], p[6], p[7])
    elif mode == B_HU:
        p = L
        d[0][0] = _avg2(p[0], p[1])
        d[0][1] = _avg3(p[0], p[1], p[2])
        d[0][2] = d[1][0] = _avg2(p[1], p[2])
        d[0][3] = d[1][1] = _avg3(p[1], p[2], p[3])
        d[1][2] = d[2][0] = _avg2(p[2], p[3])
        d[1][3] = d[2][1] = _avg3(p[2], p[3], p[3])
        d[2][2] = d[2][3] = p[3]
        d[3][0] = d[3][1] = d[3][2] = d[3][3] = p[3]
    else:  # pragma: no cover - tree cannot produce other values
        raise ValueError(f"bad bmode {mode}")
    return d


# ------------------------------------------------------------- loop filter


def _s(v):  # unsigned -> signed char
    return v - 128


def _u(v):  # signed char (clamped) -> unsigned
    return v + 128


def _sc(v):  # signed char clamp
    return -128 if v < -128 else (127 if v > 127 else v)


class _Edge:
    """Pixel accessor across one edge position: get(i)/set(i) address
    the i-th pixel perpendicular to the edge, -4..3 = p3..q3."""

    __slots__ = ("plane", "y", "x", "vert")

    def __init__(self, plane, y, x, vert):
        self.plane = plane
        self.y = y
        self.x = x
        self.vert = vert

    def get(self, i):
        if self.vert:
            return self.plane.px[self.y * self.plane.w + self.x + i]
        return self.plane.px[(self.y + i) * self.plane.w + self.x]

    def set(self, i, v):
        if self.vert:
            self.plane.px[self.y * self.plane.w + self.x + i] = v
        else:
            self.plane.px[(self.y + i) * self.plane.w + self.x] = v


def _filter_mask(e, interior, edge_limit):
    p3, p2, p1, p0 = e.get(-4), e.get(-3), e.get(-2), e.get(-1)
    q0, q1, q2, q3 = e.get(0), e.get(1), e.get(2), e.get(3)
    return (
        abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit
    )


def _hev(e, thresh):
    return abs(e.get(-2) - e.get(-1)) > thresh or abs(e.get(1) - e.get(0)) > thresh


def _common_adjust(e, use_outer):
    p1, p0 = _s(e.get(-2)), _s(e.get(-1))
    q0, q1 = _s(e.get(0)), _s(e.get(1))
    a = _sc((_sc(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _sc(a + 4) >> 3
    f2 = _sc(a + 3) >> 3
    e.set(0, _u(_sc(q0 - f1)))
    e.set(-1, _u(_sc(p0 + f2)))
    return f1


def _subblock_filter(e, hev_thresh, interior, edge_limit):
    if not _filter_mask(e, interior, edge_limit):
        return
    hev = _hev(e, hev_thresh)
    a = _common_adjust(e, hev)
    if not hev:
        a = (a + 1) >> 1
        e.set(1, _u(_sc(_s(e.get(1)) - a)))
        e.set(-2, _u(_sc(_s(e.get(-2)) + a)))


def _mb_filter(e, hev_thresh, interior, edge_limit):
    if not _filter_mask(e, interior, edge_limit):
        return
    if _hev(e, hev_thresh):
        _common_adjust(e, True)
        return
    p2, p1, p0 = _s(e.get(-3)), _s(e.get(-2)), _s(e.get(-1))
    q0, q1, q2 = _s(e.get(0)), _s(e.get(1)), _s(e.get(2))
    w = _sc(_sc(p1 - q1) + 3 * (q0 - p0))
    a = _sc((27 * w + 63) >> 7)
    q0n = _sc(q0 - a)
    p0n = _sc(p0 + a)
    a = _sc((18 * w + 63) >> 7)
    q1n = _sc(q1 - a)
    p1n = _sc(p1 + a)
    a = _sc((9 * w + 63) >> 7)
    q2n = _sc(q2 - a)
    p2n = _sc(p2 + a)
    e.set(0, _u(q0n))
    e.set(-1, _u(p0n))
    e.set(1, _u(q1n))
    e.set(-2, _u(p1n))
    e.set(2, _u(q2n))
    e.set(-3, _u(p2n))


def _simple_filter(e, edge_limit):
    p1, p0, q0, q1 = e.get(-2), e.get(-1), e.get(0), e.get(1)
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _common_adjust(e, True)


# ------------------------------------------------------------------ frame


class VP8Frame:
    __slots__ = ("width", "height", "y", "u", "v", "header", "mb_w", "mb_h")


def decode_frame(data: bytes) -> VP8Frame:
    """Decode one VP8 keyframe (the payload of a 'VP8 ' chunk)."""
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 inter frame (animation/video): only still keyframes are "
            "in scope; see module docstring for the declared boundary"
        )
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad start code")
    w_code = struct.unpack_from("<H", data, 6)[0]
    h_code = struct.unpack_from("<H", data, 8)[0]
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("VP8: zero dimension")

    bd = BoolDecoder(data[10:10 + part0_size])
    h = _parse_header(bd)

    # token partitions
    pstart = 10 + part0_size
    sizes = []
    for i in range(h.nparts - 1):
        off = pstart + 3 * i
        sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
    body = pstart + 3 * (h.nparts - 1)
    parts = []
    for s in sizes:
        parts.append(BoolDecoder(data[body:body + s]))
        body += s
    parts.append(BoolDecoder(data[body:]))

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    yplane = _Plane(mb_w * 16, mb_h * 16, top=127)
    uplane = _Plane(mb_w * 8, mb_h * 8, top=127)
    vplane = _Plane(mb_w * 8, mb_h * 8, top=127)

    dequants = _segment_dequants(h)

    # entropy context: nonzero flags. 0..3 y, 4..5 u, 6..7 v, 8 y2
    above_nz = [[0] * 9 for _ in range(mb_w)]
    # B_PRED submode context rows
    above_modes = [[B_DC] * 4 for _ in range(mb_w)]

    # per-MB records for the loop-filter pass:
    # (segment, mode, has_coeffs)
    mb_info = []

    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_modes = [B_DC] * 4
        tok = parts[mb_y % h.nparts]
        for mb_x in range(mb_w):
            seg = 0
            if h.seg_enabled and h.update_map:
                seg = bd.tree(SEGMENT_TREE, h.seg_tree_probs)
            skip = bd.bit(h.prob_skip_false) if h.mb_no_skip else 0

            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                sub = [0] * 16
                for i in range(16):
                    r, c = i >> 2, i & 3
                    above_m = above_modes[mb_x][c] if r == 0 else sub[i - 4]
                    left_m = left_modes[r] if c == 0 else sub[i - 1]
                    sub[i] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]
                    )
                above_modes[mb_x] = sub[12:16]
                left_modes = [sub[3], sub[7], sub[11], sub[15]]
            else:
                m = MODE_TO_BMODE[ymode]
                sub = [m] * 16
                above_modes[mb_x] = [m] * 4
                left_modes = [m] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dequants[seg]
            has_y2 = ymode != B_PRED

            blocks_y = [[0] * 16 for _ in range(16)]
            blocks_u = [[0] * 16 for _ in range(4)]
            blocks_v = [[0] * 16 for _ in range(4)]
            nz_y = [0] * 16
            nz_u = [0] * 4
            nz_v = [0] * 4
            has_coeffs = False

            if skip:
                for i in range(8):
                    above_nz[mb_x][i] = 0
                    left_nz[i] = 0
                if has_y2:
                    above_nz[mb_x][8] = 0
                    left_nz[8] = 0
            else:
                if has_y2:
                    ctx = above_nz[mb_x][8] + left_nz[8]
                    co, nz = _decode_block(
                        tok, h.coeff_probs[1], 0, ctx, y2dc, y2ac
                    )
                    above_nz[mb_x][8] = left_nz[8] = int(nz)
                    has_coeffs |= nz
                    y2out = iwht4x4(co)
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for i in range(16):
                    r, c = i >> 2, i & 3
                    a = above_nz[mb_x][c] if r == 0 else nz_y[i - 4]
                    lf = left_nz[r] if c == 0 else nz_y[i - 1]
                    co, nz = _decode_block(
                        tok, h.coeff_probs[btype], first, a + lf, y1dc, y1ac
                    )
                    if has_y2:
                        co[0] = y2out[i]
                    blocks_y[i] = co
                    nz_y[i] = int(nz)
                    has_coeffs |= nz or (has_y2 and y2out[i] != 0)
                for c in range(4):
                    above_nz[mb_x][c] = nz_y[12 + c]
                for r in range(4):
                    left_nz[r] = nz_y[4 * r + 3]
                for plane_i, (blocks, nzs) in enumerate(
                    ((blocks_u, nz_u), (blocks_v, nz_v))
                ):
                    base = 4 + 2 * plane_i
                    for i in range(4):
                        r, c = i >> 1, i & 1
                        a = above_nz[mb_x][base + c] if r == 0 else nzs[i - 2]
                        lf = left_nz[base + r] if c == 0 else nzs[i - 1]
                        co, nz = _decode_block(
                            tok, h.coeff_probs[2], 0, a + lf, uvdc, uvac
                        )
                        blocks[i] = co
                        nzs[i] = int(nz)
                        has_coeffs |= nz
                    for c in range(2):
                        above_nz[mb_x][base + c] = nzs[2 + c]
                    for r in range(2):
                        left_nz[base + r] = nzs[2 * r + 1]

            # ----- reconstruction
            y0, x0 = mb_y * 16, mb_x * 16
            if ymode != B_PRED:
                pred = _PRED16[ymode](yplane, y0, x0, 16)
                for i in range(16):
                    br, bc = (i >> 2) * 4, (i & 3) * 4
                    res = idct4x4(blocks_y[i])
                    for rr in range(4):
                        prow = pred[br + rr]
                        for cc in range(4):
                            prow[bc + cc] = _clamp255(
                                prow[bc + cc] + res[4 * rr + cc]
                            )
                yplane.put_block(y0, x0, 16, pred)
            else:
                # fixed above-right for the right-column subblocks: the
                # 4 pixels above-right of the MB itself
                if mb_y == 0:
                    fixed_tr = [127, 127, 127, 127]
                else:
                    fixed_tr = yplane.row(y0, x0 + 16, 4)
                for i in range(16):
                    r, c = i >> 2, i & 3
                    by, bx = y0 + r * 4, x0 + c * 4
                    above4 = yplane.row(by, bx, 4)
                    ar = fixed_tr if c == 3 else yplane.row(by, bx + 4, 4)
                    above8 = above4 + ar
                    left4 = yplane.col(by, bx, 4)
                    tl = yplane.corner(by, bx)
                    pred = _pred_b(sub[i], above8, left4, tl)
                    res = idct4x4(blocks_y[i])
                    out = [
                        [
                            _clamp255(pred[rr][cc] + res[4 * rr + cc])
                            for cc in range(4)
                        ]
                        for rr in range(4)
                    ]
                    yplane.put_block(by, bx, 4, out)

            uy, ux = mb_y * 8, mb_x * 8
            for plane, blocks in ((uplane, blocks_u), (vplane, blocks_v)):
                pred = _PRED16[uvmode](plane, uy, ux, 8)
                for i in range(4):
                    br, bc = (i >> 1) * 4, (i & 1) * 4
                    res = idct4x4(blocks[i])
                    for rr in range(4):
                        prow = pred[br + rr]
                        for cc in range(4):
                            prow[bc + cc] = _clamp255(
                                prow[bc + cc] + res[4 * rr + cc]
                            )
                plane.put_block(uy, ux, 8, pred)

            mb_info.append((seg, ymode, bool(has_coeffs)))

    _loop_filter(h, yplane, uplane, vplane, mb_w, mb_h, mb_info)

    f = VP8Frame()
    f.width, f.height = width, height
    f.header = h
    f.mb_w, f.mb_h = mb_w, mb_h
    cw, ch = (width + 1) >> 1, (height + 1) >> 1
    f.y = b"".join(
        bytes(yplane.px[r * yplane.w:r * yplane.w + width])
        for r in range(height)
    )
    f.u = b"".join(
        bytes(uplane.px[r * uplane.w:r * uplane.w + cw]) for r in range(ch)
    )
    f.v = b"".join(
        bytes(vplane.px[r * vplane.w:r * vplane.w + cw]) for r in range(ch)
    )
    return f


def _loop_filter(h, yplane, uplane, vplane, mb_w, mb_h, mb_info):
    if h.filter_level == 0:
        return
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            seg, ymode, has_coeffs = mb_info[mb_y * mb_w + mb_x]
            level = h.filter_level
            if h.seg_enabled:
                level = (
                    h.seg_lf[seg] if h.seg_abs else level + h.seg_lf[seg]
                )
            if h.lf_delta_enabled:
                level += h.ref_lf_deltas[0]  # intra frame
                if ymode == B_PRED:
                    level += h.mode_lf_deltas[0]
            level = max(0, min(63, level))
            if level == 0:
                continue

            interior = level
            if h.sharpness:
                interior >>= 1 if h.sharpness <= 4 else 2
                if interior > 9 - h.sharpness:
                    interior = 9 - h.sharpness
            if interior < 1:
                interior = 1
            mb_limit = (level + 2) * 2 + interior
            sub_limit = level * 2 + interior
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)

            inner = has_coeffs or ymode == B_PRED
            y0, x0 = mb_y * 16, mb_x * 16
            uy, ux = mb_y * 8, mb_x * 8

            if h.filter_type == 1:  # simple: luma only
                if mb_x > 0:
                    for r in range(16):
                        _simple_filter(_Edge(yplane, y0 + r, x0, True), mb_limit)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(
                                _Edge(yplane, y0 + r, x0 + dx, True), sub_limit
                            )
                if mb_y > 0:
                    for c in range(16):
                        _simple_filter(_Edge(yplane, y0, x0 + c, False), mb_limit)
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _simple_filter(
                                _Edge(yplane, y0 + dy, x0 + c, False), sub_limit
                            )
                continue

            if mb_x > 0:
                for r in range(16):
                    _mb_filter(_Edge(yplane, y0 + r, x0, True), hev_t,
                               interior, mb_limit)
                for plane, py, px in ((uplane, uy, ux), (vplane, uy, ux)):
                    for r in range(8):
                        _mb_filter(_Edge(plane, py + r, px, True), hev_t,
                                   interior, mb_limit)
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _subblock_filter(
                            _Edge(yplane, y0 + r, x0 + dx, True), hev_t,
                            interior, sub_limit
                        )
                for plane in (uplane, vplane):
                    for r in range(8):
                        _subblock_filter(
                            _Edge(plane, uy + r, ux + 4, True), hev_t,
                            interior, sub_limit
                        )
            if mb_y > 0:
                for c in range(16):
                    _mb_filter(_Edge(yplane, y0, x0 + c, False), hev_t,
                               interior, mb_limit)
                for plane in (uplane, vplane):
                    for c in range(8):
                        _mb_filter(_Edge(plane, uy, ux + c, False), hev_t,
                                   interior, mb_limit)
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _subblock_filter(
                            _Edge(yplane, y0 + dy, x0 + c, False), hev_t,
                            interior, sub_limit
                        )
                for plane in (uplane, vplane):
                    for c in range(8):
                        _subblock_filter(
                            _Edge(plane, uy + 4, ux + c, False), hev_t,
                            interior, sub_limit
                        )


# ------------------------------------------------------------------ RIFF


def decode_webp_vp8(blob: bytes) -> VP8Frame:
    """Decode the lossy 'VP8 ' chunk of a WebP container."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if tag == b"VP8 ":
            return decode_frame(blob[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8 chunk found")


def yuv420_to_rgb(frame: VP8Frame) -> bytes:
    """Interleaved RGB from the decoded planes: nearest-neighbor chroma
    upsampling + the standard BT.601 limited-range integer transform.
    The decoder's bit-exactness guarantee is at the YUV plane level
    (what the parity suite asserts); RGB conversion is presentation,
    not bitstream, so the plain spec transform is used rather than
    replicating libwebp's fancy-upsampler."""
    w, h = frame.width, frame.height
    cw = (w + 1) >> 1
    out = bytearray(w * h * 3)
    y, u, v = frame.y, frame.u, frame.v
    for r in range(h):
        yrow = r * w
        crow = (r >> 1) * cw
        orow = yrow * 3
        for c in range(w):
            yy = 298 * (y[yrow + c] - 16)
            cu = u[crow + (c >> 1)] - 128
            cv = v[crow + (c >> 1)] - 128
            rr = (yy + 409 * cv + 128) >> 8
            gg = (yy - 100 * cu - 208 * cv + 128) >> 8
            bb = (yy + 516 * cu + 128) >> 8
            o = orow + c * 3
            out[o] = 0 if rr < 0 else (255 if rr > 255 else rr)
            out[o + 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
            out[o + 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return bytes(out)


def decode_webp_lossy(blob: bytes) -> tuple[int, int, int, bytes]:
    """decode_image_real-shaped entry: lossy WebP -> (w, h, 3, RGB)."""
    frame = decode_webp_vp8(blob)
    return frame.width, frame.height, 3, yuv420_to_rgb(frame)


def decode_webp_extended(blob: bytes) -> tuple[int, int, int, bytes]:
    """VP8X still image -> (w, h, 4, RGBA bytes).

    Handles the extended container's alpha path: an ALPH chunk
    (raw or headerless-VP8L-compressed, filtered — decoded by
    webp.decode_alpha_plane) over a lossy VP8 keyframe, or a VP8L
    chunk carrying its own alpha. Animation (ANIM/ANMF) remains the
    declared boundary. Alpha bytes are validated byte-exactly against
    libwebp's RGBA decode in tests/test_vp8.py."""
    from firefly_vcut_spark.operators.webp import decode_alpha_plane, decode_vp8l

    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    alpha_chunk = None
    vp8_chunk = None
    vp8l = False
    flags = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + size]
        if tag == b"VP8X":
            flags = body[0]
            if flags & 0x02:
                raise NotImplementedError(
                    "animated WebP (ANIM/ANMF) is the remaining container "
                    "boundary; stills decode natively"
                )
        elif tag == b"ALPH":
            alpha_chunk = body
        elif tag == b"VP8 ":
            vp8_chunk = body
        elif tag == b"VP8L":
            vp8_chunk = body
            vp8l = True
        pos += 8 + size + (size & 1)
    if vp8_chunk is None:
        raise ValueError("WebP: VP8X container without image chunk")
    if vp8l:
        # lossless carries its own alpha; ALPH must not also be present
        return decode_vp8l(blob[:12] + b"VP8L" + struct.pack("<I", len(vp8_chunk)) + vp8_chunk)
    frame = decode_frame(vp8_chunk)
    rgb = yuv420_to_rgb(frame)
    w, h = frame.width, frame.height
    if alpha_chunk is not None:
        alpha = decode_alpha_plane(alpha_chunk, w, h)
    else:
        alpha = b"\xff" * (w * h)
    out = bytearray(w * h * 4)
    for i in range(w * h):
        out[4 * i:4 * i + 3] = rgb[3 * i:3 * i + 3]
        out[4 * i + 3] = alpha[i]
    return w, h, 4, bytes(out)
