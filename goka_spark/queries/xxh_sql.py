"""XXH64 in DuckDB SQL — the oracle twin of Spark's ``xxhash64``.

Spark's production dedup paths (``dedup_minhash_lsh``,
``dedup_simhash``) hash shingles/words with ``xxhash64`` (XXH64,
seed 42, over the UTF-8 bytes) — fast JVM-side, but historically
rows-only in the driver gate because DuckDB has no xxhash64.  This
module GENERATES the hash in portable SQL so those keys become fully
hash-verified: 64-bit wraparound arithmetic is emulated in HUGEINT
(128-bit) with an explicit ``mod 2^64`` after every multiply/add —
products of split 32-bit limbs stay < 2^97, comfortably inside
HUGEINT — and each algorithm step is a named lateral-alias column, so
the generated SQL is linear in the step count, never exponential.

Validated three ways (tests/test_xxh_sql.py): against Spark's
``xxhash64`` itself, against a pure-Python XXH64 reference, and on
adversarial lengths (empty string, 4/8/31/32/33-byte boundaries,
multi-stripe strings).

Spark hashes ARRAY columns as a sequential fold — element ``k``'s
hash uses element ``k-1``'s result as its seed — which the minhash
signature-hash oracle replays with a recursive CTE (one XXH64
instance, iterated).
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

_M64 = 1 << 64


def _mul(a: str, b: str) -> str:
    """(a*b) mod 2^64 via 32-bit limb split; a, b are UBIGINT exprs
    (keep them column names or literals — ``a`` is referenced twice)."""
    return (f"CAST(((({a}) % 4294967296)::HUGEINT * ({b})"
            f" + ((({a}) >> 32)::HUGEINT * ({b}) % 4294967296)"
            f" * 4294967296) % {_M64} AS UBIGINT)")


def _add(a: str, b: str) -> str:
    return f"CAST((({a})::HUGEINT + ({b})) % {_M64} AS UBIGINT)"


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)"


def _rotl(x: str, r: int) -> str:
    """Left-rotate; the two parts occupy disjoint bit ranges, so OR
    is addition.  ``x`` is referenced twice — pass a column name."""
    return (f"CAST(((({x})::HUGEINT * {1 << r}) % {_M64}"
            f" + (({x}) >> {64 - r})) AS UBIGINT)")


def _lane8(hx: str, off: str) -> str:
    """Little-endian u64 from 8 bytes of the (padded) hex dump at
    byte offset ``off`` (an expression; referenced 8 times — keep it
    a column or a trivial arithmetic term)."""
    parts = " || ".join(
        f"substr({hx}, 2*({off}) + {2 * k + 1}, 2)"
        for k in reversed(range(8)))
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _lane4(hx: str, off: str) -> str:
    parts = " || ".join(
        f"substr({hx}, 2*({off}) + {2 * k + 1}, 2)"
        for k in reversed(range(4)))
    return f"CAST('0x' || {parts} AS UBIGINT)"


def _byte(hx: str, off: str) -> str:
    return f"CAST('0x' || substr({hx}, 2*({off}) + 1, 2) AS UBIGINT)"


def xxh64_cols(p: str, hx: str, n: str, seed: str,
               max_len: int) -> "tuple[list[tuple[str, str]], str]":
    """Column chain computing XXH64 of the bytes whose PADDED hex dump
    is in column ``hx`` (true byte length ``n``), seeded by the
    UBIGINT expression ``seed``, fully unrolled for inputs up to
    ``max_len`` bytes.  ``hx`` must be padded (``|| repeat('0', 80)``)
    so out-of-range lane reads parse as zeros — they only ever feed
    CASE branches that discard them.

    Returns (cols, result_col): emit ``cols`` in order as lateral
    aliases of one SELECT; ``result_col`` holds the hash (UBIGINT).
    All names are prefixed with ``p`` for composability.
    """
    cols: list[tuple[str, str]] = []
    n_stripes = max_len // 32

    if n_stripes:
        # ---- stripe phase (n >= 32): 4 accumulators, 32 B/stripe
        inits = [_add(seed, str((P1 + P2) % _M64)), _add(seed, str(P2)),
                 f"({seed})", _add(seed, str(_M64 - P1))]
        for k in range(4):
            cols.append((f"{p}acc{k}_0", inits[k]))
        for s in range(n_stripes):
            guard = f"{n} >= {32 * (s + 1)}"
            for k in range(4):
                lane = f"{p}l{s}_{k}"
                cols.append((lane, _lane8(hx, str(32 * s + 8 * k))))
                a_in = f"{p}acc{k}_{s}"
                t1 = f"{p}sa{s}_{k}"
                cols.append((t1, _add(a_in, _mul(lane, str(P2)))))
                t2 = f"{p}sb{s}_{k}"
                cols.append((t2, _rotl(t1, 31)))
                cols.append((f"{p}acc{k}_{s + 1}",
                             f"CASE WHEN {guard} THEN {_mul(t2, str(P1))}"
                             f" ELSE {a_in} END"))
        # ---- converge + merge rounds
        accs = [f"{p}acc{k}_{n_stripes}" for k in range(4)]
        conv = _add(_add(_rotl(accs[0], 1), _rotl(accs[1], 7)),
                    _add(_rotl(accs[2], 12), _rotl(accs[3], 18)))
        cols.append((f"{p}hm0", conv))
        h = f"{p}hm0"
        for k in range(4):
            r0a = f"{p}mr{k}a"
            cols.append((r0a, _mul(accs[k], str(P2))))
            r0b = f"{p}mr{k}b"
            cols.append((r0b, _rotl(r0a, 31)))
            r0 = f"{p}mr{k}"
            cols.append((r0, _mul(r0b, str(P1))))
            hx_ = f"{p}hmx{k}"
            cols.append((hx_, _xor(h, r0)))
            h2 = f"{p}hm{k + 1}"
            cols.append((h2, _add(_mul(hx_, str(P1)), str(P4))))
            h = h2
        cols.append((f"{p}hpre",
                     f"CASE WHEN {n} >= 32 THEN {h}"
                     f" ELSE {_add(seed, str(P5))} END"))
    else:
        cols.append((f"{p}hpre", _add(seed, str(P5))))

    # byte offset where the tail starts; 0 when no stripe ran
    cols.append((f"{p}o", f"(({n}) // 32) * 32"))
    cols.append((f"{p}t0", _add(f"{p}hpre", n)))

    # ---- up to three 8-byte tail chunks
    t = f"{p}t0"
    for c in range(3):
        guard = f"({n}) - {p}o >= {8 * (c + 1)}"
        lane = f"{p}tl{c}"
        cols.append((lane, _lane8(hx, f"{p}o + {8 * c}")))
        ra = f"{p}ta{c}"
        cols.append((ra, _mul(lane, str(P2))))
        rb = f"{p}tb{c}"
        cols.append((rb, _rotl(ra, 31)))
        rc = f"{p}tc{c}"
        cols.append((rc, _mul(rb, str(P1))))
        xo = f"{p}tx{c}"
        cols.append((xo, _xor(t, rc)))
        ro = f"{p}tr{c}"
        cols.append((ro, _rotl(xo, 27)))
        t2 = f"{p}t{c + 1}"
        cols.append((t2,
                     f"CASE WHEN {guard} THEN "
                     f"{_add(_mul(ro, str(P1)), str(P4))} ELSE {t} END"))
        t = t2

    # ---- one 4-byte chunk
    cols.append((f"{p}rem", f"(({n}) - {p}o) % 8"))
    guard4 = f"{p}rem >= 4"
    cols.append((f"{p}o4", f"{p}o + ((({n}) - {p}o) // 8) * 8"))
    l4 = f"{p}l4"
    cols.append((l4, _lane4(hx, f"{p}o4")))
    cols.append((f"{p}x4", _xor(t, _mul(l4, str(P1)))))
    cols.append((f"{p}r4", _rotl(f"{p}x4", 23)))
    t4 = f"{p}t4"
    cols.append((t4,
                 f"CASE WHEN {guard4} THEN "
                 f"{_add(_mul(f'{p}r4', str(P2)), str(P3))} ELSE {t} END"))
    t = t4

    # ---- up to three single bytes
    cols.append((f"{p}left", f"CASE WHEN {p}rem >= 4 THEN {p}rem - 4"
                 f" ELSE {p}rem END"))
    cols.append((f"{p}ob", f"({n}) - {p}left"))
    for k in range(3):
        guard = f"{p}left > {k}"
        bk = f"{p}b{k}"
        cols.append((bk, _byte(hx, f"{p}ob + {k}")))
        xb = f"{p}xb{k}"
        cols.append((xb, _xor(t, _mul(bk, str(P5)))))
        rb = f"{p}rb{k}"
        cols.append((rb, _rotl(xb, 11)))
        t2 = f"{p}u{k}"
        cols.append((t2,
                     f"CASE WHEN {guard} THEN {_mul(rb, str(P1))}"
                     f" ELSE {t} END"))
        t = t2

    # ---- avalanche
    cols.append((f"{p}v1", _xor(t, f"({t}) >> 33")))
    cols.append((f"{p}v2", _mul(f"{p}v1", str(P2))))
    cols.append((f"{p}v3", _xor(f"{p}v2", f"{p}v2 >> 29")))
    cols.append((f"{p}v4", _mul(f"{p}v3", str(P3))))
    cols.append((f"{p}v5", _xor(f"{p}v4", f"{p}v4 >> 32")))
    return cols, f"{p}v5"


def signed64(u: str) -> str:
    """UBIGINT → Spark's signed BIGINT two's-complement view."""
    return (f"CAST(CASE WHEN ({u}) >= 9223372036854775808"
            f" THEN ({u})::HUGEINT - {_M64}"
            f" ELSE ({u})::HUGEINT END AS BIGINT)")


def layered(inner_sql: str, cols: "list[tuple[str, str]]") -> str:
    """Wrap each step column in its OWN subquery layer.  Lateral
    column aliases would be prettier, but DuckDB resolves them by
    expression substitution — a 50-step chain whose steps reference
    their input twice (every mul/rotl does) expands exponentially and
    the planner never returns.  A projection layer per step keeps the
    plan linear: each expression references real child columns."""
    sql = inner_sql
    for name, expr in cols:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


def xxh64_select(inner_sql: str, text_expr: str, out_col: str,
                 carry: "list[str]", seed: str = "42::UBIGINT",
                 max_len: int = 40, p: str = "x_") -> str:
    """A full SELECT computing ``out_col`` = XXH64(text_expr bytes,
    seed) over ``inner_sql`` rows, carrying ``carry`` columns through.
    ``max_len`` must bound the true byte length (unroll depth)."""
    cols, res = xxh64_cols(p, f"{p}hx", f"{p}n", seed, max_len)
    # pad so every UNROLLED lane read parses as zeros even on short
    # rows (stripe s reads bytes up to 32*(s+1)-1 regardless of n;
    # only CASE guards discard the value)
    pad = 2 * (max_len + 40)
    base = (f"SELECT {', '.join(carry)}, "
            f"hex(encode({text_expr})) || repeat('0', {pad}) AS {p}hx, "
            f"octet_length(encode({text_expr})) AS {p}n "
            f"FROM ({inner_sql})")
    return (f"SELECT {', '.join(carry)}, {res} AS {out_col} "
            f"FROM ({layered(base, cols)})")
