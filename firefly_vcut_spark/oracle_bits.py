"""DuckDB-SQL emitters for the two engine primitives the oracle could
not previously replay: exact LCS (indel similarity, reference
fuzz.py:26,36 semantics) and Spark's ``xxhash64``.

Both are *generated SQL*, not UDFs: the driver's oracle harness runs a
single SQL string against DuckDB views, so anything the oracle needs
must be expressible as one query. DuckDB 1.0 gives us 128-bit HUGEINT
with full bitwise ops (&, |, xor, <<, >>) and ``list_reduce`` — enough
to run word-level bit-parallel algorithms inside a scalar expression.

- ``lcs_expr(a, b)``: longest-common-subsequence length via the
  Allison–Dix bit-vector recurrence on ONE 126-bit HUGEINT word
  (needle ≤ 126 chars; the fixture lyrics max out under 100). This is
  the same recurrence as functions/similarity.py::lcs_length, so the
  Spark pandas-UDF path and the DuckDB oracle compute byte-identical
  scores.
- ``xxh64`` / ``XXH64Chain``: Spark's XxHash64 expression (XXH64 with
  seed chaining; int literals take the 4-byte hashInt path) emitted as
  a chain of projection columns over a byte list. Python reference
  implementations live here too and are pytest-compared against
  ``F.xxhash64`` so the SQL is anchored to the engine, not to our
  reading of the spec.

All arithmetic is mod 2^64 (or 2^126 for the LCS word) simulated in
HUGEINT: products are split 32/64 so no intermediate exceeds 2^97.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Python reference: XXH64 exactly as Spark's XXH64.java computes it
# (one 64-bit state; unsigned arithmetic emulated on Python ints).
# ---------------------------------------------------------------------------

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M64 = (1 << 64) - 1
SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned result)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        for s in range(n // 32):
            o = s * 32
            v1 = _round(v1, int.from_bytes(data[o : o + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[o + 8 : o + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[o + 16 : o + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[o + 24 : o + 32], "little"))
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    o = n - n % 32
    while n - o >= 8:
        h ^= _round(0, int.from_bytes(data[o : o + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        o += 8
    if n - o >= 4:
        h ^= (int.from_bytes(data[o : o + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        o += 4
    while o < n:
        h ^= (data[o] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        o += 1
    return _fmix(h)


def xxh64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt — the 4-byte path IntegerType values take."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong — the 8-byte path LongType values take."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """``F.xxhash64(col)`` for a string column (signed, like Spark)."""
    return to_signed64(xxh64_bytes(s.encode("utf-8"), seed))


def seed_after_int_lit(i: int, seed: int = SPARK_HASH_SEED) -> int:
    """Spark chains multi-arg xxhash64 by feeding each argument's hash
    in as the next seed: ``xxhash64(lit(i), s)`` hashes the int literal
    first. Returns the (unsigned) seed the string argument then sees."""
    return xxh64_int(i, seed)


# ---------------------------------------------------------------------------
# SQL emitter: 64-bit wrapping arithmetic on HUGEINT
# ---------------------------------------------------------------------------

TWO64 = 1 << 64
_H = "::HUGEINT"
# Bitwise &/|/>>/<< on HUGEINT are ~20x faster than 128-bit division
# in DuckDB, so every mod-2^64 and power-of-two divide below is a
# mask/shift. All values stay nonnegative (< 2^97), so >> is safe.
_M64 = f"{M64}{_H}"
_M32 = f"{(1 << 32) - 1}{_H}"


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 with every intermediate < 2^97 (HUGEINT-safe):
    split a into 32-bit halves."""
    return (
        f"((((((({a}) >> 32) * ({b})) & {_M32}) << 32)"
        f" + ((({a}) & {_M32}) * ({b}))) & {_M64})"
    )


def _add64(*xs: str) -> str:
    return "((" + " + ".join(f"({x})" for x in xs) + f") & {_M64})"


def _rotl64(x: str, r: int) -> str:
    return f"((((({x}) << {r}) & {_M64}) | (({x}) >> {64 - r})))"


def _xor64(a: str, b: str) -> str:
    return f"xor(({a}){_H}, ({b}){_H})"


def _shr64(x: str, r: int) -> str:
    return f"(({x}) >> {r})"


def _le_word(bytes_col: str, off: str, width: int) -> str:
    """Little-endian unsigned integer from ``width`` bytes of a BIGINT
    list at 0-based byte offset expression ``off`` (lists are 1-based,
    hence the +1)."""
    terms = [
        f"({bytes_col})[({off}) + {k + 1}]{_H} * {1 << (8 * k)}" for k in range(width)
    ]
    return "(" + " + ".join(terms) + ")"


def bytes_list(s: str) -> str:
    """UTF-8 byte values of a VARCHAR expression as LIST(BIGINT),
    via hex(encode(..)) so multi-byte characters are handled exactly
    like Spark's UnsafeRow bytes."""
    hx = f"hex(encode({s}))"
    return (
        f"list_transform(range(1, octet_length(encode({s})) + 1), _bi -> "
        f"CAST((strpos('0123456789ABCDEF', substr({hx}, 2*CAST(_bi AS INTEGER)-1, 1)) - 1) * 16"
        f" + strpos('0123456789ABCDEF', substr({hx}, 2*CAST(_bi AS INTEGER), 1)) - 1 AS BIGINT))"
    )


def _sql_round(acc: str, lane: str) -> str:
    """XXH64 lane round: rotl31(acc + lane*P2) * P1 (all mod 2^64)."""
    return _mul64(_rotl64(_add64(acc, _mul64(lane, str(P2))), 31), str(P1))


def xxh64_sql_steps(
    bs: str, n: str, seed: str, out: str
) -> list[tuple[str, str]]:
    """Emit ``(column, expr)`` projection steps computing XXH64 of the
    byte-list column ``bs`` (length column ``n``) with seed expression
    ``seed`` (unsigned HUGEINT). Final unsigned hash lands in ``out``.

    Steps reference earlier columns by name, so each expression stays
    small and nothing is recomputed — the emitted query is a chain of
    nested projections (see ``chain_sql``)."""
    steps: list[tuple[str, str]] = []
    seed = f"(({seed}){_H})"  # promote before any arithmetic: a bare
    # int64 literal seed would overflow INT64 addition otherwise
    # stripe fold (only when n >= 32); struct carries the 4 lanes
    init = (
        f"{{'v1': {_add64(seed, str((P1 + P2) & M64))}, "
        f"'v2': {_add64(seed, str(P2))}, "
        f"'v3': ({seed}){_H} % {TWO64}{_H}, "
        f"'v4': {_add64(seed, str(TWO64 - P1))}, 'si': 0{_H}}}"
    )
    lanes = {
        f"v{k + 1}": _sql_round(f"acc.v{k + 1}", _le_word(bs, f"CAST(x.si AS BIGINT) * 32 + {8 * k}", 8))
        for k in range(4)
    }
    fold = (
        f"list_reduce(list_prepend({init}, "
        f"list_transform(range(({n}) // 32), _s -> "
        f"{{'v1': 0{_H}, 'v2': 0{_H}, 'v3': 0{_H}, 'v4': 0{_H}, 'si': _s{_H}}})), "
        f"(acc, x) -> {{'v1': {lanes['v1']}, 'v2': {lanes['v2']}, "
        f"'v3': {lanes['v3']}, 'v4': {lanes['v4']}, 'si': x.si}})"
    )
    steps.append((f"{out}_st", f"CASE WHEN ({n}) >= 32 THEN {fold} ELSE NULL END"))
    merged = _add64(
        _rotl64(f"{out}_st.v1", 1),
        _rotl64(f"{out}_st.v2", 7),
        _rotl64(f"{out}_st.v3", 12),
        _rotl64(f"{out}_st.v4", 18),
    )
    for k in range(4):
        merged = _add64(
            _mul64(_xor64(merged, _sql_round("0", f"{out}_st.v{k + 1}")), str(P1)),
            str(P4),
        )
    steps.append(
        (
            f"{out}_h0",
            f"CASE WHEN ({n}) >= 32 THEN {merged} "
            f"ELSE {_add64(seed, str(P5))} END",
        )
    )
    steps.append((f"{out}_h1", _add64(f"{out}_h0", f"({n}){_H}")))
    # tail: up to three 8-byte chunks from offset n - n%32
    prev = f"{out}_h1"
    for c in range(3):
        lane = _le_word(bs, f"({n}) - ({n}) % 32 + {8 * c}", 8)
        step = _add64(
            _mul64(_rotl64(_xor64(prev, _sql_round("0", lane)), 27), str(P1)),
            str(P4),
        )
        steps.append(
            (
                f"{out}_h8{c}",
                f"CASE WHEN ({n}) % 32 >= {8 * (c + 1)} THEN {step} ELSE {prev} END",
            )
        )
        prev = f"{out}_h8{c}"
    # one 4-byte chunk from offset n - n%8
    lane4 = _le_word(bs, f"({n}) - ({n}) % 8", 4)
    step4 = _add64(
        _mul64(_rotl64(_xor64(prev, _mul64(lane4, str(P1))), 23), str(P2)),
        str(P3),
    )
    steps.append(
        (f"{out}_h4", f"CASE WHEN ({n}) % 8 >= 4 THEN {step4} ELSE {prev} END")
    )
    prev = f"{out}_h4"
    # up to three trailing bytes from offset n - n%4
    for j in range(3):
        byte = f"({bs})[({n}) - ({n}) % 4 + {j + 1}]{_H}"
        stepb = _mul64(
            _rotl64(_xor64(prev, _mul64(byte, str(P5))), 11), str(P1)
        )
        steps.append(
            (
                f"{out}_hb{j}",
                f"CASE WHEN ({n}) % 4 >= {j + 1} THEN {stepb} ELSE {prev} END",
            )
        )
        prev = f"{out}_hb{j}"
    # avalanche
    steps.append((f"{out}_a0", _xor64(prev, _shr64(prev, 33))))
    steps.append((f"{out}_a1", _mul64(f"{out}_a0", str(P2))))
    steps.append((f"{out}_a2", _xor64(f"{out}_a1", _shr64(f"{out}_a1", 29))))
    steps.append((f"{out}_a3", _mul64(f"{out}_a2", str(P3))))
    steps.append((out, _xor64(f"{out}_a3", _shr64(f"{out}_a3", 32))))
    return steps


def signed64(u: str) -> str:
    """Unsigned HUGEINT → Spark's signed BIGINT value."""
    return (
        f"CAST(CASE WHEN ({u}) >= {1 << 63}{_H} THEN ({u}) - {TWO64}{_H} "
        f"ELSE ({u}) END AS BIGINT)"
    )


def chain_sql(base: str, keep: list[str], steps: list[tuple[str, str]]) -> str:
    """Wrap projection steps into nested SELECTs over ``base`` (a table
    or subquery in parens), keeping ``keep`` columns visible."""
    sql = base
    cols = ", ".join(keep)
    for name, expr in steps:
        sql = f"(SELECT {cols}, {expr} AS {name} FROM {sql})"
        cols += f", {name}"
    return sql


# ---------------------------------------------------------------------------
# Fast multi-seed emitter: all per-seed hashes in ONE lambda expression
# ---------------------------------------------------------------------------
#
# The chain emitter above costs ~15 nested projections PER seed — fine
# for one hash, prohibitive for MinHash's 32 seeds. This variant
# exploits that the byte-lane values are seed-independent: a prep pass
# materializes, once per string, the 8-byte words (``w8``) and the
# tail-op structs (``ops`` — each op's lane contribution pre-mixed),
# and then EVERY seed's hash is computed by one ``list_transform`` over
# a seed list, with ``list_reduce`` folds for the tail and avalanche.
# Lambda variables keep expression size linear (an acc referenced
# twice in a fold body is a variable, not a textual copy).

_OPST = "STRUCT(k INTEGER, v HUGEINT)[]"


def xxh64_prep_steps(bs: str, n: str, p: str) -> list[tuple[str, str]]:
    """Projection steps materializing seed-independent lane state for
    the byte-list column ``bs`` (length ``n``): ``{p}_w8`` = all
    little-endian 8-byte words, ``{p}_ops`` = the tail operation list
    (kind 0 = 8-byte chunk pre-rounded, kind 1 = 4-byte chunk ×P1,
    kind 2 = single byte ×P5)."""
    w8 = (
        f"list_transform(range(({n}) // 8), _j -> "
        + _le_word(bs, "CAST(_j AS BIGINT) * 8", 8)
        + ")"
    )
    op8 = (
        f"list_transform(range((({n}) % 32) // 8), _c -> "
        f"{{'k': 0, 'v': {_sql_round('0', f'{p}_w8[(({n}) - ({n}) % 32) // 8 + _c + 1]')}}})"
    )
    op4 = (
        f"CASE WHEN ({n}) % 8 >= 4 THEN "
        f"[{{'k': 1, 'v': {_mul64(_le_word(bs, f'({n}) - ({n}) % 8', 4), str(P1))}}}] "
        f"ELSE []::{_OPST} END"
    )
    opb = (
        f"list_transform(range(({n}) % 4), _t -> "
        f"{{'k': 2, 'v': {_mul64(f'({bs})[({n}) - ({n}) % 4 + _t + 1]{_H}', str(P5))}}})"
    )
    return [
        (f"{p}_w8", w8),
        (f"{p}_ops", f"list_concat(list_concat({op8}::{_OPST}, {op4}), {opb}::{_OPST})"),
    ]


def xxh64_multi_expr(p: str, n: str, seeds: str) -> str:
    """One expression computing XXH64 (unsigned HUGEINT) of the
    prepped string for EVERY seed in the SQL list expression ``seeds``
    (unsigned HUGEINT elements) — returns a HUGEINT list in seed
    order. Requires ``xxh64_prep_steps(bs, n, p)`` columns in scope.
    Matches the chain emitter / XXH64.java bit-for-bit, including the
    n ≥ 32 stripe path."""
    # stripe fold: struct acc {v1..v4}, one round per 8-byte lane
    init = (
        f"{{'v1': {_add64('_sd', str((P1 + P2) & M64))}, "
        f"'v2': {_add64('_sd', str(P2))}, "
        f"'v3': (_sd) % {TWO64}{_H}, "
        f"'v4': {_add64('_sd', str(TWO64 - P1))}, 'si': CAST(-1 AS BIGINT)}}"
    )
    lanes = {
        f"v{k + 1}": _sql_round(f"_ac.v{k + 1}", f"{p}_w8[4 * _x.si + {k + 1}]")
        for k in range(4)
    }
    sf = (
        f"list_reduce(list_prepend({init}, "
        f"list_transform(range(({n}) // 32), _s -> "
        f"{{'v1': 0{_H}, 'v2': 0{_H}, 'v3': 0{_H}, 'v4': 0{_H}, 'si': CAST(_s AS BIGINT)}})), "
        f"(_ac, _x) -> {{'v1': {lanes['v1']}, 'v2': {lanes['v2']}, "
        f"'v3': {lanes['v3']}, 'v4': {lanes['v4']}, 'si': _x.si}})"
    )
    m0 = _add64(
        _rotl64(f"{sf}.v1", 1),
        _rotl64(f"{sf}.v2", 7),
        _rotl64(f"{sf}.v3", 12),
        _rotl64(f"{sf}.v4", 18),
    )
    merge = (
        f"list_reduce(list_prepend({m0}, "
        f"[{sf}.v1, {sf}.v2, {sf}.v3, {sf}.v4]), "
        f"(_ac2, _v) -> {_add64(_mul64(_xor64('_ac2', _sql_round('0', '_v')), str(P1)), str(P4))})"
    )
    base = (
        f"CASE WHEN ({n}) >= 32 THEN {merge} "
        f"ELSE {_add64('_sd', str(P5))} END"
    )
    h1 = _add64(base, f"({n}){_H}")
    # list_reduce's accumulator must share the element struct type, so
    # the running hash rides in the 'v' field of a sentinel element.
    # The op-kind dispatch is branch-FREE (boolean-multiply selection):
    # a CASE on _o.k inside the fold lambda returns wrong lanes under
    # DuckDB's batch vectorization (single-row evaluation is fine) —
    # exactly one selector is 1, so the sum stays < 2^64.
    step8 = _add64(_mul64(_rotl64(_xor64("_ac3.v", "_o.v"), 27), str(P1)), str(P4))
    step4 = _add64(_mul64(_rotl64(_xor64("_ac3.v", "_o.v"), 23), str(P2)), str(P3))
    stepb = _mul64(_rotl64(_xor64("_ac3.v", "_o.v"), 11), str(P1))
    sel = (
        f"(({step8}) * (_o.k = 0)::HUGEINT + ({step4}) * (_o.k = 1)::HUGEINT "
        f"+ ({stepb}) * (_o.k = 2)::HUGEINT)"
    )
    tail = (
        f"list_reduce(list_prepend({{'k': -1, 'v': {h1}}}, {p}_ops), (_ac3, _o) -> "
        f"{{'k': -1, 'v': {sel}}}).v"
    )
    ava_z = (
        f"[{{'d': 33, 'm': {P2}{_H}}}, "
        f"{{'d': 29, 'm': {P3}{_H}}}, "
        f"{{'d': 32, 'm': 1{_H}}}]"
    )
    ava = (
        f"list_reduce(list_prepend({{'d': 0, 'm': {tail}}}, {ava_z}), "
        f"(_ac4, _z) -> {{'d': 0, "
        f"'m': {_mul64(_xor64('_ac4.m', '(_ac4.m >> _z.d)'), '_z.m')}}}).m"
    )
    return f"list_transform(({seeds}), _sd -> {ava})"


# ---------------------------------------------------------------------------
# SQL emitter: bit-parallel LCS (Allison–Dix) on one 126-bit word
# ---------------------------------------------------------------------------

LCS_MAX_NEEDLE = 126  # bits available in HUGEINT minus sign headroom
_TWO126 = 1 << 126
_M126 = _TWO126 - 1


def lcs_expr(a: str, b: str) -> str:
    """LCS length of VARCHAR expressions ``a`` (needle, ≤126 chars —
    NULL beyond, so a violation surfaces as an oracle mismatch rather
    than a wrong number) and ``b`` (any length).

    Identical recurrence to functions/similarity.py::lcs_length:
    row' = x & ~(x - ((row<<1)|1)) with x = row | mask[ch], all mod
    2^126; LCS = popcount(row)."""
    mask = (
        f"list_sum(list_transform(range(1, length({a}) + 1), _i -> "
        f"CASE WHEN substr({a}, CAST(_i AS INTEGER), 1) = _ch "
        f"THEN 1{_H} << (CAST(_i AS INTEGER) - 1) ELSE 0{_H} END))"
    )
    masks = f"list_transform(string_split({b}, ''), _ch -> coalesce({mask}, 0{_H}))"
    x = "(acc | m)"
    y = f"(((acc * 2) % {_TWO126}{_H}) | 1{_H})"
    t = f"({x} - {y})"
    t_mod = f"(CASE WHEN {t} < 0 THEN {t} + {_TWO126}{_H} ELSE {t} END)"
    step = f"({x} & ({_M126}{_H} - {t_mod}))"
    fold = f"list_reduce(list_prepend(0{_H}, {masks}), (acc, m) -> {step})"
    return (
        f"CASE WHEN length({a}) > {LCS_MAX_NEEDLE} THEN NULL "
        f"WHEN length({a}) = 0 OR length({b}) = 0 THEN 0 "
        f"ELSE bit_count({fold}) END"
    )


def indel_ratio_expr(a: str, b: str) -> str:
    """Exact normalized indel similarity (rapidfuzz ``fuzz.ratio``):
    200·LCS/(|a|+|b|), 100 for two empties — the same definition as
    functions/similarity.py::indel_ratio."""
    return (
        f"CASE WHEN length({a}) + length({b}) = 0 THEN 100.0 "
        f"ELSE 200.0 * CAST({lcs_expr(a, b)} AS DOUBLE) "
        f"/ (length({a}) + length({b})) END"
    )
