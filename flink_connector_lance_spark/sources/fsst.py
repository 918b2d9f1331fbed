"""FSST string compression — decode-first, pure-stdlib.

FSST (Fast Static Symbol Table) is the string codec modern lance
writes variable-width pages with by default at scale, so a real 2.1
dataset hits it immediately; until this module the engine refused it
by field number. Everything here derives from the PUBLIC algorithm
description — Boncz, Neumann, Leis, "FSST: Fast Random Access String
Compression", PVLDB 13(11), 2020 — not from any implementation's
source:

- A **symbol table** holds up to 255 symbols (codes ``0..254``), each
  1-8 bytes long.
- The compressed stream is a byte sequence where each byte is either a
  symbol code (substituted by its symbol on decode) or the **escape
  byte 255**, after which the next byte passes through literally.
- Because the table is static per block, decompression is a single
  substitution loop and any substring can be decoded independently —
  the property lance exploits to keep per-string random access.

The paper's encoder builds the table with an iterative
generate-and-score loop (bottom-up symbol merging over a sample).
The encoder here keeps the paper's GAIN MODEL — a symbol of length
``L`` used ``f`` times saves ``f*(L-1)`` bytes, and a single-byte
symbol saves ``f`` bytes versus escaping — but scores one generation
of substring candidates greedily instead of iterating merges. That
trades compression ratio (never correctness) for simplicity; decode
accepts ANY valid table, so lance-core-written streams would decode
regardless of how clever their encoder was.

Serialized table layout (this engine's framing — the byte layout of
lance's own table blob is not pinnable in this environment, same
caveat as every 2.1 reconstruction in lance_format.py):
``[u8 n_symbols][n_symbols x u8 symbol length][concatenated symbol
bytes]``.

Corruption posture: a code beyond the table, a truncated escape, or a
malformed table raises a loud ``ValueError`` naming the defect — never
a silent misread (the lance_format contract).
"""

from __future__ import annotations

from collections import Counter

ESCAPE = 0xFF
MAX_SYMBOLS = 255  # codes 0..254; 255 is the escape byte
MAX_SYMBOL_LEN = 8

# encoder sampling bounds: the table is built from at most this many
# bytes of input (the paper samples too — table quality saturates fast)
_SAMPLE_BYTES = 1 << 16


def build_symbol_table(pieces: "list[bytes]") -> list[bytes]:
    """A symbol table for ``pieces`` (the page's string values), greedy
    over one generation of substring candidates. Deterministic in the
    input, so re-encodes stay byte-stable: candidates tie-break on
    (gain, symbol bytes)."""
    counts: Counter = Counter()
    budget = _SAMPLE_BYTES
    for b in pieces:
        if budget <= 0:
            break
        b = b[:budget]
        budget -= len(b)
        n = len(b)
        for i in range(n):
            # substrings of length 1..MAX_SYMBOL_LEN starting at i
            for ln in range(1, min(MAX_SYMBOL_LEN, n - i) + 1):
                counts[b[i:i + ln]] += 1
    # gain model from the paper: replacing a length-L occurrence with a
    # 1-byte code saves L-1 bytes; a length-1 symbol saves 1 byte versus
    # the 2-byte escape it would otherwise need
    scored = sorted(
        counts.items(),
        key=lambda kv: (-(kv[1] * (len(kv[0]) - 1) if len(kv[0]) > 1
                          else kv[1]), kv[0]),
    )
    return [sym for sym, _ in scored[:MAX_SYMBOLS]]


def _match_index(table: "list[bytes]") -> "tuple[dict[int, dict[bytes, int]], list[int]]":
    """The longest-match lookup for ``table``: symbols grouped by length
    (longest first). Built once per page — the encode loop runs per
    string value, and rebuilding this 255-entry index per value costs
    ~20k redundant constructions on a typical page (round-12 advice)."""
    if len(table) > MAX_SYMBOLS:
        raise ValueError(f"FSST table holds {len(table)} symbols (max {MAX_SYMBOLS})")
    by_len: dict[int, dict[bytes, int]] = {}
    for code, sym in enumerate(table):
        by_len.setdefault(len(sym), {})[sym] = code
    return by_len, sorted(by_len, reverse=True)


def compress_many(pieces: "list[bytes]", table: "list[bytes]") -> "list[bytes]":
    """Encode every piece against one shared lookup (see _match_index) —
    the page-level entry point; ``compress`` stays for single values."""
    by_len, lens = _match_index(table)
    return [_compress_with(b, by_len, lens) for b in pieces]


def compress(data: bytes, table: "list[bytes]") -> bytes:
    """Greedy longest-match encoding of ``data`` against ``table`` —
    at each position the longest symbol that matches wins; uncovered
    bytes escape as ``[0xFF, byte]``."""
    by_len, lens = _match_index(table)
    return _compress_with(data, by_len, lens)


def _compress_with(data: bytes, by_len: "dict[int, dict[bytes, int]]",
                   lens: "list[int]") -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        for ln in lens:
            code = by_len[ln].get(data[i:i + ln])
            if code is not None:
                out.append(code)
                i += ln
                break
        else:
            out.append(ESCAPE)
            out.append(data[i])
            i += 1
    return bytes(out)


def decompress(data: bytes, table: "list[bytes]") -> bytes:
    """The substitution loop: each byte is a symbol code unless it is
    the escape (0xFF), which passes the following byte through. Loud on
    out-of-table codes and truncated escapes."""
    out = bytearray()
    n_sym = len(table)
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == ESCAPE:
            if i + 1 >= n:
                raise ValueError(
                    "FSST stream truncated: escape byte at end of data")
            out.append(data[i + 1])
            i += 2
        else:
            if c >= n_sym:
                raise ValueError(
                    f"FSST code {c} beyond the {n_sym}-symbol table "
                    "(corrupt stream or wrong table)")
            out += table[c]
            i += 1
    return bytes(out)


def serialize_table(table: "list[bytes]") -> bytes:
    """``[u8 n][n x u8 len][symbol bytes]`` — this engine's framing
    (see the module docstring's reconstruction caveat)."""
    if len(table) > MAX_SYMBOLS:
        raise ValueError(f"FSST table holds {len(table)} symbols (max {MAX_SYMBOLS})")
    out = bytearray([len(table)])
    for sym in table:
        if not 1 <= len(sym) <= MAX_SYMBOL_LEN:
            raise ValueError(
                f"FSST symbol length {len(sym)} outside 1..{MAX_SYMBOL_LEN}")
        out.append(len(sym))
    for sym in table:
        out += sym
    return bytes(out)


def deserialize_table(raw: bytes) -> list[bytes]:
    """Inverse of :func:`serialize_table`; loud on truncation and
    out-of-range symbol lengths."""
    if not raw:
        raise ValueError("FSST table blob is empty")
    n = raw[0]
    if len(raw) < 1 + n:
        raise ValueError(
            f"FSST table blob truncated: {n} symbols declared, "
            f"{len(raw) - 1} header bytes present")
    lens = list(raw[1:1 + n])
    for ln in lens:
        if not 1 <= ln <= MAX_SYMBOL_LEN:
            raise ValueError(
                f"FSST symbol length {ln} outside 1..{MAX_SYMBOL_LEN}")
    total = sum(lens)
    body = raw[1 + n:]
    if len(body) != total:
        raise ValueError(
            f"FSST table blob size mismatch: symbols declare {total} "
            f"bytes, {len(body)} present")
    out = []
    p = 0
    for ln in lens:
        out.append(bytes(body[p:p + ln]))
        p += ln
    return out
