"""WebP-lossless (VP8L) codec — pure stdlib, no image library.

Closes the last declared codec guard in ``multimodal.decode_image_real``
(r7 verdict item 8): WebP's LOSSLESS bitstream decodes for real. Since
r11 the lossy (VP8 keyframe) path decodes for real too — see
``operators/vp8.py`` — so the remaining boundary narrows to extended
WebP (VP8X alpha/animation).

Decoder scope (WebP Lossless Bitstream Specification):
- LSB-first bit reader over the RIFF/VP8L payload;
- canonical prefix codes, both the 1-2 symbol "simple" form and the
  normal form (code-length codes in the spec's kCodeLengthCodeOrder,
  16/17/18 repeat ops, optional max_symbol cap) — code bits enter the
  stream MSB-of-code-first (the DEFLATE convention libwebp's reversed
  table lookup implements);
- meta-prefix (entropy image) group selection;
- color cache (0x1e35a7bd multiplicative hash, 1-11 bits);
- LZ77 backward references with the prefix-coded length/distance
  values and the 120-entry near-pixel distance map (derived from the
  spec's ordering rule — all (dx, dy), dy 0..7, dx -7..8 (dx >= 1
  when dy = 0), sorted by (dx²+dy², dy DESC, dx sign) — and verified
  against the spec's listed first 24 entries);
- all four inverse transforms: PREDICTOR (14 modes), COLOR
  (signed-delta cross-channel), SUBTRACT_GREEN, COLOR_INDEXING
  (delta-coded palette incl. sub-byte packed indices).

The encoder exists to make fixtures the decoder can be proven on
(the same strategy as the synthetic PPM/JPEG/GIF roundtrips): it
emits spec-legal streams with every feature toggleable — transforms,
color cache, 1-tile meta-prefix, distance-mapped LZ77 run emission —
so each decoder path is exercised by an encode→decode == numpy
ground-truth test rather than left as untested spec prose.

Reference analog: none (the reference pipeline has no image path);
this extends the engine's multimodal surface, SURVEY §2 extensions.
"""

from __future__ import annotations

import heapq
import struct

# ---------------------------------------------------------------- bit io


class BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bitstream overrun")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


class BitWriter:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits enter the stream MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc])
        return out


# ------------------------------------------------------- canonical codes

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (increasing
    length, then symbol order) — the DEFLATE/VP8L convention."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class PrefixDecoder:
    """Bit-by-bit canonical decoder; also models the 0-bit
    single-symbol code (simple form with one symbol)."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1 and nz[0][0] == 0:
            raise ValueError("invalid")
        if len(nz) == 1:
            # treat as single-symbol zero-bit code
            self.single = nz[0][1]
            self.table = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym for sym, (code, ln) in canonical_codes(lengths).items()
        }
        self.max_len = max(ln for ln, _ in self.table) if self.table else 0

    @classmethod
    def single_symbol(cls, sym: int) -> "PrefixDecoder":
        d = cls.__new__(cls)
        d.single = sym
        d.table = {}
        return d

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > self.max_len:
                raise ValueError("VP8L: invalid prefix code bits")


def huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from a histogram (heapq Huffman). Fixture-scale
    inputs never approach the 15-bit cap; assert rather than reshape."""
    items = [(f, sym) for sym, f in freqs.items() if f > 0]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][1]: 1}
    heap = [(f, i, [sym]) for i, (f, sym) in enumerate(sorted(items))]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    nxt = len(heap)
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, nxt, sa + sb))
        nxt += 1
    lens = {s: d for s, d in depth.items() if freqs.get(s, 0) > 0}
    if max(lens.values()) > max_len:
        raise AssertionError("fixture histogram exceeded 15-bit code cap")
    return lens


# ------------------------------------------------------- distance map


def _distance_map() -> list[tuple[int, int]]:
    """The 120 near-pixel (dx, dy) codes, spec ordering: sorted by
    squared distance, then larger dy first, then positive dx before
    negative."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] >= 0 else 1, abs(p[0])))
    return cands[:120]


_DIST_MAP = _distance_map()
# spec-listed head of the table (WebP Lossless Bitstream Specification
# §4.2.2) — pins the derived ordering rule
assert _DIST_MAP[:24] == [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
], _DIST_MAP[:24]

_DIST_CODE = {p: i + 1 for i, p in enumerate(_DIST_MAP)}


def _plane_code_to_distance(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * w + dx)


def _distance_to_plane_code(w: int, dist: int) -> int:
    """Encoder side: prefer a neighbor code when one represents dist."""
    for (dx, dy), idx in _DIST_CODE.items():
        if dy * w + dx == dist and max(1, dy * w + dx) == dist:
            return idx
    return dist + 120


# -------------------------------------------------- LZ77 value coding


def _lz77_decode_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code_for_value(v: int) -> tuple[int, int, int]:
    """value -> (code, extra_value, extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    extra = (v - 1).bit_length() - 2
    offset = (2 + (((v - 1) >> extra) & 1)) << extra
    code = 2 * extra + (((v - 1) >> extra) & 1) + 2
    return code, v - offset - 1, extra


# ------------------------------------------------------------ transforms

_PRED_BLACK = (255, 0, 0, 0)  # ARGB


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: tuple, T: tuple, TR: tuple, TL: tuple) -> tuple:
    if mode == 0:
        return _PRED_BLACK
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = tuple(l + t - tl for l, t, tl in zip(L, T, TL))
        pl = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pt = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return tuple(_clamp(a + (a - tl) // 2 if a >= tl else a - (tl - a) // 2)
                     for a, tl in zip(ave, TL))
    raise ValueError(f"VP8L: predictor mode {mode}")


def _ctdelta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5, arithmetic."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# ------------------------------------------------------------- decoder


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixDecoder:
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return PrefixDecoder.single_symbol(sym0)
        sym1 = br.read(8)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        lengths[sym1] = 1
        return PrefixDecoder(lengths)
    # normal form
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = PrefixDecoder(cl_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        clen = cl.decode(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen:
                prev = clen
        elif clen == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif clen == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    return PrefixDecoder(lengths)


def _decode_entropy_image(
    br: BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Decode one entropy-coded ARGB image (spec 'decode image data')
    → list of packed 0xAARRGGBB ints, row-major."""
    cache_bits = 0
    cache = None
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
        cache = [0] * (1 << cache_bits)

    groups_idx = None
    n_groups = 1
    meta_bits = 0
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        entropy_img = _decode_entropy_image(br, ew, eh, False)
        groups_idx = [((p >> 8) & 0xFFFF) for p in entropy_img]
        n_groups = max(groups_idx) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    n = w * h
    out: list[int] = []

    def cache_insert(px: int) -> None:
        if cache is not None:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while len(out) < n:
        if groups_idx is not None:
            pos = len(out)
            x, y = pos % w, pos // w
            ew = (w + (1 << meta_bits) - 1) >> meta_bits
            g = groups[groups_idx[(y >> meta_bits) * ew + (x >> meta_bits)]]
        else:
            g = groups[0]
        gc, rc, bc, ac, dc = g
        s = gc.decode(br)
        if s < 256:
            r = rc.decode(br)
            b = bc.decode(br)
            a = ac.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            cache_insert(px)
        elif s < 256 + 24:
            length = _lz77_decode_value(s - 256, br)
            dcode = dc.decode(br)
            dist = _plane_code_to_distance(w, _lz77_decode_value(dcode, br))
            if dist > len(out):
                raise ValueError("VP8L: backward reference before start")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                cache_insert(px)
        else:
            out.append(cache[s - 256 - 24])  # type: ignore[index]
    return out[:n]


def _apply_inverse_transforms(
    pixels: list[int], w: int, h: int, transforms: list[tuple]
) -> tuple[list[int], int]:
    """Apply inverse transforms in reverse encode order; returns the
    final pixel list and the final width (color-indexing changes it)."""
    for t in reversed(transforms):
        kind = t[0]
        if kind == "subtract_green":
            for i, p in enumerate(pixels):
                a, r, g, b = p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
                r = (r + g) & 0xFF
                b = (b + g) & 0xFF
                pixels[i] = (a << 24) | (r << 16) | (g << 8) | b
        elif kind == "predictor":
            _, bits, tiles, tw = t
            out: list[tuple] = []
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    p = pixels[i]
                    res = (p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
                    if x == 0 and y == 0:
                        pred = _PRED_BLACK
                    elif y == 0:
                        pred = out[i - 1]
                    elif x == 0:
                        pred = out[i - w]
                    else:
                        mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                        L = out[i - 1]
                        T = out[i - w]
                        # at the right edge i-w+1 lands on the CURRENT
                        # row's leftmost pixel — the spec's TR rule
                        TR = out[i - w + 1]
                        TL = out[i - w - 1]
                        pred = _predict(mode, L, T, TR, TL)
                    out.append(tuple((rc + pc) & 0xFF for rc, pc in zip(res, pred)))
                    pixels[i] = (
                        (out[i][0] << 24) | (out[i][1] << 16) | (out[i][2] << 8) | out[i][3]
                    )
        elif kind == "color":
            _, bits, tiles, tw = t
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    tp = tiles[(y >> bits) * tw + (x >> bits)]
                    # spec ColorTransformElement-as-pixel: RED channel
                    # carries red_to_blue, GREEN green_to_blue, BLUE
                    # green_to_red
                    r2b = (tp >> 16) & 0xFF
                    g2b = (tp >> 8) & 0xFF
                    g2r = tp & 0xFF
                    p = pixels[i]
                    a, r, g, b = p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
                    r = (r + _ctdelta(g2r, g)) & 0xFF
                    b = (b + _ctdelta(g2b, g)) & 0xFF
                    b = (b + _ctdelta(r2b, r)) & 0xFF
                    pixels[i] = (a << 24) | (r << 16) | (g << 8) | b
        elif kind == "color_index":
            _, palette, packed_w, px_per_byte, bits_per_px = t
            out2: list[int] = []
            for y in range(h):
                for x in range(w):
                    gi = pixels[y * packed_w + (x // px_per_byte)]
                    green = (gi >> 8) & 0xFF
                    shift = (x % px_per_byte) * bits_per_px
                    idx = (green >> shift) & ((1 << bits_per_px) - 1)
                    if idx >= len(palette):
                        raise ValueError("VP8L: palette index out of range")
                    out2.append(palette[idx])
            pixels = out2
        else:  # pragma: no cover
            raise ValueError(kind)
    return pixels, w


def decode_vp8l(blob: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WEBP container with a VP8L chunk → (w, h, 4, RGBA bytes)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    payload = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if tag == b"VP8L":
            payload = blob[pos + 8 : pos + 8 + size]
            break
        if tag == b"VP8 ":
            # lossy stills decode natively since r11 — route there so
            # direct decode_vp8l callers keep working on mixed inputs
            from firefly_vcut_spark.operators.vp8 import decode_webp_lossy

            return decode_webp_lossy(blob)
        if tag == b"VP8X":
            # extended stills (alpha over lossy/lossless) decode
            # natively since r11; animation raises inside
            from firefly_vcut_spark.operators.vp8 import decode_webp_extended

            return decode_webp_extended(blob)
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP: no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    pixels = _decode_vp8l_body(br, w, h)
    rgba = bytearray()
    for p in pixels:
        rgba += bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, p >> 24))
    return w, h, 4, bytes(rgba)


def _decode_vp8l_body(br: BitReader, w: int, h: int) -> list[int]:
    """Transform list + entropy-coded image for a VP8L stream whose
    signature/dimension header has already been consumed (the shared
    core of the VP8L chunk and the headerless ALPH alpha stream, whose
    dimensions come from the enclosing frame)."""
    transforms: list[tuple] = []
    img_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        elif ttype in (0, 1):  # predictor / color
            bits = br.read(3) + 2
            tw = (img_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(
                ("predictor" if ttype == 0 else "color", bits, tiles, tw)
            )
        elif ttype == 3:  # color indexing
            psize = br.read(8) + 1
            praw = _decode_entropy_image(br, psize, 1, False)
            palette = []
            prev = 0
            for p in praw:  # delta-coded per channel
                cur = 0
                for sh in (24, 16, 8, 0):
                    c = ((p >> sh) + (prev >> sh)) & 0xFF
                    cur |= c << sh
                palette.append(cur)
                prev = cur
            if psize <= 2:
                bits_per_px, px_per_byte = 1, 8
            elif psize <= 4:
                bits_per_px, px_per_byte = 2, 4
            elif psize <= 16:
                bits_per_px, px_per_byte = 4, 2
            else:
                bits_per_px, px_per_byte = 8, 1
            packed_w = (img_w + px_per_byte - 1) // px_per_byte
            transforms.append(
                ("color_index", palette, packed_w, px_per_byte, bits_per_px)
            )
            img_w = packed_w
        else:  # pragma: no cover
            raise ValueError("VP8L: bad transform")
        if len(transforms) > 4:
            raise ValueError("VP8L: too many transforms")

    pixels = _decode_entropy_image(br, img_w, h, True)
    pixels, _ = _apply_inverse_transforms(pixels, w, h, transforms)
    return pixels


def decode_alpha_plane(data: bytes, w: int, h: int) -> bytes:
    """WebP ALPH chunk payload -> w*h alpha bytes (row-major).

    Header byte: bits 0-1 compression (0 raw, 1 headerless VP8L whose
    green channel carries the alpha), bits 2-3 the per-row prediction
    filter (0 none, 1 horizontal, 2 vertical, 3 gradient), bits 4-5
    pre-processing (encoder-side level reduction; nothing to invert).
    Validated byte-exactly against libwebp's decoded alpha channel in
    tests/test_vp8.py."""
    if not data:
        raise ValueError("ALPH: empty chunk")
    head = data[0]
    compression = head & 3
    filt = (head >> 2) & 3
    if compression == 0:
        plane = bytearray(data[1:1 + w * h])
        if len(plane) != w * h:
            raise ValueError("ALPH: truncated raw alpha")
    elif compression == 1:
        br = BitReader(data, 1)
        pixels = _decode_vp8l_body(br, w, h)
        plane = bytearray((p >> 8) & 0xFF for p in pixels)
    else:
        raise ValueError(f"ALPH: bad compression {compression}")
    if filt == 0:
        return bytes(plane)
    out = bytearray(w * h)
    for r in range(h):
        row = r * w
        prev = row - w
        if r == 0 or filt == 1:  # horizontal (rows 0 of all filters too)
            pred = 0 if r == 0 else out[prev]
            for c in range(w):
                pred = out[row + c] = (pred + plane[row + c]) & 0xFF
        elif filt == 2:  # vertical
            for c in range(w):
                out[row + c] = (out[prev + c] + plane[row + c]) & 0xFF
        else:  # gradient
            left = tl = out[prev]
            for c in range(w):
                top = out[prev + c]
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = out[row + c] = (g + plane[row + c]) & 0xFF
                tl = top
    return bytes(out)


# ------------------------------------------------------------- encoder
#
# Fixture encoder: spec-legal VP8L with every decoder path toggleable
# (transform kind, color cache, 1-tile meta-prefix, LZ77 runs), so the
# roundtrip tests exercise the decoder against numpy ground truth.


def _encoder_codes(lengths_by_sym: dict[int, int]) -> dict[int, tuple[int, int]]:
    nz = [(s, ln) for s, ln in lengths_by_sym.items() if ln]
    if len(nz) == 1:
        return {nz[0][0]: (0, 0)}  # single-symbol code: zero bits
    size = max(lengths_by_sym) + 1
    lens = [0] * size
    for s, ln in lengths_by_sym.items():
        lens[s] = ln
    return canonical_codes(lens)


def _write_prefix_code(
    bw: BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Write one prefix code (simple or normal form) for the given
    histogram; return symbol -> (code, length) for payload writing."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and max(used) < 256:
        # simple form
        bw.write(1, 1)
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first > 1:
            bw.write(1, 1)
            bw.write(first, 8)
        else:
            bw.write(0, 1)
            bw.write(first, 1)
        if len(used) == 2:
            bw.write(used[1], 8)
            lens = {used[0]: 1, used[1]: 1}
        else:
            lens = {used[0]: 0}
        return _encoder_codes(lens) if len(used) == 2 else {used[0]: (0, 0)}
    # normal form
    bw.write(0, 1)
    lens_map = huffman_lengths({s: freqs[s] for s in used})
    lens = [lens_map.get(s, 0) for s in range(alphabet_size)]
    # tokenize code lengths: literal 0-15 plus zero-run ops 17/18
    tokens: list[tuple[int, int, int]] = []  # (cl_sym, extra, extra_bits)
    i = 0
    while i < alphabet_size:
        if lens[i] == 0:
            j = i
            while j < alphabet_size and lens[j] == 0:
                j += 1
            run = j - i
            if j == alphabet_size:
                break  # trailing zeros are implicit
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            tokens.append((lens[i], 0, 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lens = huffman_lengths(cl_freqs)
    num_codes = max(
        4, max(_CL_ORDER.index(s) + 1 for s in cl_lens)
    )
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lens.get(_CL_ORDER[i], 0), 3)
    # trailing zeros are implicit, so the decoder MUST be told how
    # many code-length tokens to read (it decrements max_symbol once
    # per read): cap = token count
    while len(tokens) < 2:
        tokens.append((0, 0, 0))
    x = 0
    while (len(tokens) - 2) >> (2 + 2 * x) and x < 7:
        x += 1
    bw.write(1, 1)
    bw.write(x, 3)
    bw.write(len(tokens) - 2, 2 + 2 * x)
    cl_codes = _encoder_codes(cl_lens)
    for sym, extra, extra_bits in tokens:
        c, ln = cl_codes[sym]
        bw.write_code(c, ln)
        if extra_bits:
            bw.write(extra, extra_bits)
    return _encoder_codes(lens_map)


def _tokenize(
    pixels: list[int], w: int, cache_bits: int, lz77: bool
) -> list[tuple]:
    """('lit', px) / ('copy', length, dist) / ('cache', idx) tokens,
    simulating the decoder's cache state exactly."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    toks: list[tuple] = []
    n = len(pixels)
    i = 0

    def insert(px: int) -> None:
        if cache is not None:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while i < n:
        if lz77 and i > 0:
            best_len = 0
            best_dist = 0
            for dist in (1, 2, w, w + 1):
                if dist > i or dist < 1:
                    continue
                ln = 0
                while i + ln < n and ln < 4096 and pixels[i + ln] == pixels[i + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                toks.append(("copy", best_len, best_dist))
                for k in range(best_len):
                    insert(pixels[i + k])
                i += best_len
                continue
        px = pixels[i]
        if cache is not None:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                toks.append(("cache", idx))
                i += 1
                continue
        toks.append(("lit", px))
        insert(px)
        i += 1
    return toks


def _encode_entropy_image(
    bw: BitWriter,
    pixels: list[int],
    w: int,
    h: int,
    cache_bits: int = 0,
    use_meta: bool = False,
    lz77: bool = True,
    main: bool = False,
) -> None:
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    # the meta-prefix bit exists only in the MAIN image's stream;
    # sub-images (transform tiles, palette, the entropy image itself)
    # have no such bit
    if main:
        if use_meta:
            # one tile covering the image: 2^bits >= max(w, h)
            bits = 2
            while (1 << bits) < max(w, h):
                bits += 1
            if bits > 9:
                raise AssertionError("meta fixture image too large")
            bw.write(1, 1)
            bw.write(bits - 2, 3)
            _encode_entropy_image(bw, [0xFF000000], 1, 1)  # index 0
        else:
            bw.write(0, 1)

    toks = _tokenize(pixels, w, cache_bits, lz77)
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d: dict[int, int], k: int) -> None:
        d[k] = d.get(k, 0) + 1

    for t in toks:
        if t[0] == "lit":
            px = t[1]
            bump(gf, (px >> 8) & 0xFF)
            bump(rf, (px >> 16) & 0xFF)
            bump(bf, px & 0xFF)
            bump(af, px >> 24)
        elif t[0] == "copy":
            lcode, _, _ = _lz77_code_for_value(t[1])
            bump(gf, 256 + lcode)
            dcode, _, _ = _lz77_code_for_value(_distance_to_plane_code(w, t[2]))
            bump(df, dcode)
        else:
            bump(gf, 256 + 24 + t[1])
    for d in (rf, bf, af, df):
        if not d:
            d[0] = 1  # a code must exist even if never read

    gc = _write_prefix_code(bw, gf, green_size)
    rc = _write_prefix_code(bw, rf, 256)
    bc = _write_prefix_code(bw, bf, 256)
    ac = _write_prefix_code(bw, af, 256)
    dc = _write_prefix_code(bw, df, 40)

    def put(codes: dict[int, tuple[int, int]], sym: int) -> None:
        c, ln = codes[sym]
        bw.write_code(c, ln)

    for t in toks:
        if t[0] == "lit":
            px = t[1]
            put(gc, (px >> 8) & 0xFF)
            put(rc, (px >> 16) & 0xFF)
            put(bc, px & 0xFF)
            put(ac, px >> 24)
        elif t[0] == "copy":
            lcode, lex, lbits = _lz77_code_for_value(t[1])
            put(gc, 256 + lcode)
            if lbits:
                bw.write(lex, lbits)
            pc = _distance_to_plane_code(w, t[2])
            dcode, dex, dbits = _lz77_code_for_value(pc)
            put(dc, dcode)
            if dbits:
                bw.write(dex, dbits)
        else:
            put(gc, 256 + 24 + t[1])


def encode_vp8l(
    rgba: bytes,
    w: int,
    h: int,
    *,
    cache_bits: int = 0,
    use_meta: bool = False,
    lz77: bool = True,
    transform: object = None,
) -> bytes:
    """RGBA bytes → RIFF/WEBP container with a VP8L lossless chunk.

    transform: None | 'subtract_green' | ('predictor', mode) |
    ('color', (g2r, g2b, r2b)) | 'palette' — each emitted as a
    single-tile (or palette) spec-legal transform so the decoder's
    inverse path is exercised end to end."""
    pixels = []
    for i in range(w * h):
        r, g, b, a = rgba[4 * i : 4 * i + 4]
        pixels.append((a << 24) | (r << 16) | (g << 8) | b)

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    img_w = w
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        for i, p in enumerate(pixels):
            a, r, g, b = p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
            pixels[i] = (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
    elif isinstance(transform, tuple) and transform[0] == "predictor":
        mode = transform[1]
        bits = 2
        while (1 << bits) < max(w, h):
            bits += 1
        if bits > 9:
            raise AssertionError("predictor fixture image too large")
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        _encode_entropy_image(bw, [0xFF000000 | (mode << 8)], 1, 1)
        out = []
        res = []
        for y in range(h):
            for x in range(w):
                i = y * w + x
                p = pixels[i]
                cur = (p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
                if x == 0 and y == 0:
                    pred = _PRED_BLACK
                elif y == 0:
                    pred = out[i - 1]
                elif x == 0:
                    pred = out[i - w]
                else:
                    pred = _predict(
                        mode, out[i - 1], out[i - w], out[i - w + 1], out[i - w - 1]
                    )
                out.append(cur)
                r4 = tuple((c - pc) & 0xFF for c, pc in zip(cur, pred))
                res.append((r4[0] << 24) | (r4[1] << 16) | (r4[2] << 8) | r4[3])
        pixels = res
    elif isinstance(transform, tuple) and transform[0] == "color":
        g2r, g2b, r2b = transform[1]
        bits = 2
        while (1 << bits) < max(w, h):
            bits += 1
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        _encode_entropy_image(bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r], 1, 1)
        for i, p in enumerate(pixels):
            a, r, g, b = p >> 24, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
            nr = (r - _ctdelta(g2r, g)) & 0xFF
            nb = (b - _ctdelta(g2b, g) - _ctdelta(r2b, r)) & 0xFF
            pixels[i] = (a << 24) | (nr << 16) | (g << 8) | nb
    elif transform == "palette":
        palette = sorted(set(pixels))
        if len(palette) > 256:
            raise AssertionError("palette fixture has > 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(palette) - 1, 8)
        deltas = []
        prev = 0
        for p in palette:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((p >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = p
        _encode_entropy_image(bw, deltas, len(palette), 1)
        psize = len(palette)
        if psize <= 2:
            bpp, ppb = 1, 8
        elif psize <= 4:
            bpp, ppb = 2, 4
        elif psize <= 16:
            bpp, ppb = 4, 2
        else:
            bpp, ppb = 8, 1
        idx_of = {p: i for i, p in enumerate(palette)}
        packed_w = (w + ppb - 1) // ppb
        packed = []
        for y in range(h):
            for bx in range(packed_w):
                green = 0
                for k in range(ppb):
                    x = bx * ppb + k
                    if x < w:
                        green |= idx_of[pixels[y * w + x]] << (k * bpp)
                packed.append(0xFF000000 | (green << 8))
        pixels = packed
        img_w = packed_w
    elif transform is not None:
        raise ValueError(f"unknown fixture transform {transform!r}")

    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(
        bw, pixels, img_w, h, cache_bits=cache_bits, use_meta=use_meta,
        lz77=lz77, main=True,
    )
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
