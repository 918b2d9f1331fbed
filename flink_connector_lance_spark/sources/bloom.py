"""Per-fragment bloom filters: point-predicate data skipping.

Zone maps (``fragments.parquet_fragment_stats``) prune fragments on
*range* predicates, but a high-cardinality point lookup (``doc_id =
'...'``, ``id IN (...)``) on a randomly-laid-out table has every
fragment's [min, max] straddling the literal — zone maps keep
everything and the scan reads the whole table. The reference carries no
statistics at all (ref table/LanceCatalog.java:683-704); real Lance
solves point lookups with btree/bitmap *scalar indexes*. This module is
the planning-time analog sized for a manifest-driven planner: one small
bloom filter per (fragment, column), built executor-side at write time,
consulted on the driver before any task is scheduled.

Scale shape (100 TB):
- Build is fragment-parallel (one task per fragment, column-pruned
  parquet read) — no shuffle, no driver data.
- Sidecars (``<fragment>.bloom.json``) live next to the fragment file;
  the manifest records only ``{file, per-column m/k}`` (bytes, not the
  bit array), so the driver-side manifest stays metadata-sized at 10^5
  fragments.
- Consultation is lazy: a sidecar is read only when a pushed
  EqualTo/In filter names a bloom column AND the zone map kept the
  fragment; reads are LRU-cached (fragment files are immutable —
  copy-on-write rewrites get new names, so a cached bloom can never go
  stale).
- A fragment without a bloom (old versions, rewritten by
  compaction/DELETE/MERGE) simply doesn't prune — conservative, never
  wrong. The pushed filter still runs inside the scan.

Default sizing: 10 bits/row (~1% false-positive rate at k=7), capped at
128 KiB per column per fragment — a 1M-row fragment's bloom saturates
the cap at ~1.05 bits... the cap instead trades fpp for bounded sidecar
size (fpp degrades gracefully; pruning weakens but stays sound).

Hashing is engine-portable and type-canonical (int/bool -> splitmix64,
str -> md5) so the same value hashes identically at write time
(executor, numpy-vectorized for ints) and plan time (driver, scalar).
Floats are refused as bloom columns (equality on floats is already a
data-modeling bug).
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
from functools import lru_cache

BLOOM_SUFFIX = ".bloom.json"
BLOOM_STATS_KEY = "__bloom__"  # FragmentInfo.stats reserved key
DEFAULT_BITS_PER_ROW = 10
MAX_BITS = 8 * 128 * 1024  # 128 KiB per column per fragment

_MASK64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def _hash_pair(value) -> "tuple[int, int] | None":
    """(h1, h2) for one scalar, or None if the type is un-bloomable.

    bool is an int subclass — canonicalized through the int path so
    ``x = true`` and ``x = 1`` agree with the write-side encoding.
    """
    if isinstance(value, bool):
        value = int(value)
    if isinstance(value, int):
        h1 = _splitmix64(value & _MASK64)
        h2 = _splitmix64(h1) | 1
        return h1, h2
    if isinstance(value, str):
        d = hashlib.md5(value.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:16], "little") | 1
        return h1, h2
    return None


def _params(n_rows: int, bits_per_row: int, max_bits: int) -> "tuple[int, int]":
    m = max(64, min(int(max_bits), int(n_rows) * int(bits_per_row)))
    # optimal k = ln2 * m/n, clamped to [1, 16]
    k = max(1, min(16, round(0.6931 * m / max(1, n_rows))))
    return m, k


class BloomFilter:
    """Fixed-size bloom with double hashing: idx_i = (h1 + i*h2) mod m."""

    def __init__(self, m_bits: int, k: int, bits: "bytearray | None" = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = bits if bits is not None else bytearray((self.m + 7) // 8)

    def _set(self, idx: int) -> None:
        self.bits[idx >> 3] |= 1 << (idx & 7)

    def _get(self, idx: int) -> bool:
        return bool(self.bits[idx >> 3] & (1 << (idx & 7)))

    def add(self, value) -> None:
        hp = _hash_pair(value)
        if hp is None:
            return
        h1, h2 = hp
        # & _MASK64 first: the vectorized path wraps at 64 bits, and
        # (h1 + i*h2) mod m only agrees with the wrapped sum when m is a
        # power of two — wrap explicitly so scalar == vectorized for all m
        for i in range(self.k):
            self._set(((h1 + i * h2) & _MASK64) % self.m)

    def add_int_array(self, values) -> None:
        """Vectorized add for an integer numpy array (nulls pre-dropped)."""
        import numpy as np

        x = values.astype(np.uint64, copy=True)
        with np.errstate(over="ignore"):
            x += np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h1 = x ^ (x >> np.uint64(31))
            y = h1 + np.uint64(0x9E3779B97F4A7C15)
            y = (y ^ (y >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            y = (y ^ (y >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h2 = (y ^ (y >> np.uint64(31))) | np.uint64(1)
            arr = np.frombuffer(self.bits, dtype=np.uint8).copy()
            for i in range(self.k):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                np.bitwise_or.at(arr, (idx >> np.uint64(3)).astype(np.int64),
                                 np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
        self.bits = bytearray(arr.tobytes())

    def might_contain(self, value) -> bool:
        """False = PROVABLY absent; True = maybe present (or un-bloomable
        value type — conservative)."""
        hp = _hash_pair(value)
        if hp is None:
            return True
        h1, h2 = hp
        return all(
            self._get(((h1 + i * h2) & _MASK64) % self.m) for i in range(self.k)
        )

    def to_json(self) -> dict:
        return {"m": self.m, "k": self.k,
                "b64": base64.b64encode(bytes(self.bits)).decode("ascii")}

    @classmethod
    def from_json(cls, d: dict) -> "BloomFilter":
        return cls(d["m"], d["k"], bytearray(base64.b64decode(d["b64"])))


def _bloomable_arrow_type(t) -> "str | None":
    """'int' | 'str' for supported pyarrow column types, else None."""
    import pyarrow.types as pt

    if pt.is_integer(t) or pt.is_boolean(t):
        return "int"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    return None


def build_bloom_sidecar(
    fragment_abs_path: str,
    columns: "list[str]",
    bits_per_row: int = DEFAULT_BITS_PER_ROW,
    max_bits: int = MAX_BITS,
) -> "dict | None":
    """Build blooms for ``columns`` of one fragment file and write the
    ``<fragment>.bloom.json`` sidecar next to it (executor-side; the
    parquet read is column-pruned to exactly ``columns``).

    Returns the manifest stats entry ``{"file": <sidecar basename>,
    "cols": {col: {"m": m, "k": k}}}`` or None if no requested column is
    bloomable. Unknown / float / nested columns are skipped silently —
    absence of a bloom only disables pruning.
    """
    import pyarrow.parquet as pq

    schema = pq.read_schema(fragment_abs_path)
    present = [c for c in columns if c in schema.names
               and _bloomable_arrow_type(schema.field(c).type) is not None]
    if not present:
        return None
    table = pq.read_table(fragment_abs_path, columns=present)
    return build_bloom_sidecar_from_table(table, fragment_abs_path, present,
                                          bits_per_row, max_bits)


def build_bloom_payload(
    table,
    columns: "list[str]",
    bits_per_row: int = DEFAULT_BITS_PER_ROW,
    max_bits: int = MAX_BITS,
) -> "tuple[dict, dict] | None":
    """Pure core shared by every sidecar writer: ``(payload, cols)``
    where ``payload`` is the JSON-serializable filter map and ``cols``
    the tiny per-column parameter entry recorded in fragment stats.
    Storage-agnostic, so the s3 write path can PUT the payload straight
    from the executor task that encoded the fragment."""
    present = [c for c in columns if c in table.column_names
               and _bloomable_arrow_type(table.schema.field(c).type) is not None]
    if not present:
        return None
    out_cols: dict[str, dict] = {}
    payload: dict[str, dict] = {}
    for col in present:
        arr = table.column(col).combine_chunks()
        kind = _bloomable_arrow_type(arr.type)
        n = len(arr) - arr.null_count
        m, k = _params(max(1, n), bits_per_row, max_bits)
        bf = BloomFilter(m, k)
        try:
            if kind == "int":
                bf.add_int_array(
                    arr.drop_null().cast("int64").to_numpy(zero_copy_only=False)
                )
            else:
                for v in arr.drop_null().to_pylist():
                    bf.add(v)
        except Exception:
            # e.g. uint64 values past int64 range overflow the cast: a
            # bloom is an optimization — skip the column, never fail the
            # WRITE that asked for it
            continue
        payload[col] = bf.to_json()
        out_cols[col] = {"m": m, "k": k}
    if not payload:
        return None
    return payload, out_cols


def build_bloom_sidecar_from_table(
    table,
    fragment_abs_path: str,
    columns: "list[str]",
    bits_per_row: int = DEFAULT_BITS_PER_ROW,
    max_bits: int = MAX_BITS,
) -> "dict | None":
    """Table-based core of ``build_bloom_sidecar`` — used directly by the
    native v2 write path, which already holds the fragment's rows as an
    Arrow table at encode time (no re-read)."""
    built = build_bloom_payload(table, columns, bits_per_row, max_bits)
    if built is None:
        return None
    payload, out_cols = built
    sidecar = fragment_abs_path + BLOOM_SUFFIX
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, sidecar)
    return {"file": os.path.basename(sidecar), "cols": out_cols}


def attach_blooms(spark, path: str, fragments, columns: "list[str]",
                  bits_per_row: int = DEFAULT_BITS_PER_ROW):
    """Distributed bloom build for freshly promoted fragments: one task
    per fragment (no shuffle; the driver collects only the tiny stats
    entries, never the bit arrays). Returns a NEW fragment list with ``stats['__bloom__']``
    recorded; input order (and fragment ids) preserved."""
    from . import fragments as FR

    if not columns or not fragments:
        return list(fragments)
    abs_path = os.path.abspath(path)
    files = [(i, os.path.join(abs_path, f.file)) for i, f in enumerate(fragments)]
    bpr = int(bits_per_row)
    cols = list(columns)

    def build(item):
        idx, fp = item
        from flink_connector_lance_spark.sources.bloom import build_bloom_sidecar

        return idx, build_bloom_sidecar(fp, cols, bits_per_row=bpr)

    sc = spark.sparkContext
    results = dict(sc.parallelize(files, max(1, len(files))).map(build).collect())
    out = []
    for i, f in enumerate(fragments):
        entry = results.get(i)
        if entry is None:
            out.append(f)
            continue
        stats = dict(f.stats or {})
        stats[BLOOM_STATS_KEY] = entry
        out.append(FR.FragmentInfo(f.fragment_id, f.file, f.row_count, stats))
    return out


@lru_cache(maxsize=4096)
def _load_sidecar(sidecar_abs_path: str) -> "dict | None":
    """Sidecar JSON, LRU-cached by absolute path (fragment files — and
    therefore their sidecars — are immutable: rewrites get new names)."""
    try:
        with open(sidecar_abs_path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None  # missing/corrupt sidecar -> no pruning


@lru_cache(maxsize=1024)
def _load_remote_sidecar(url: str, storage_items: "tuple | None") -> "dict | None":
    """Remote twin of ``_load_sidecar``: one fsspec GET per sidecar URL,
    LRU-cached (sidecars are immutable — rewrites get new names)."""
    from .fs import get_fs

    try:
        fs = get_fs(url, dict(storage_items) if storage_items else None)
        with fs.open(url, "rb") as fh:
            return json.loads(fh.read().decode())
    except Exception:
        return None  # missing/corrupt/unreachable sidecar -> no pruning


def fragment_bloom_may_contain(root: str, fragment_file: str, stats: "dict | None",
                               column: str, values,
                               storage_options: "dict | None" = None) -> bool:
    """Driver-side planning test: can ANY of ``values`` be present in
    this fragment's ``column``?  True whenever no bloom applies. Remote
    (s3://) roots fetch the sidecar through fsspec with the caller's
    storage options; local roots read the file directly."""
    from .fs import is_remote

    if not stats:
        return True
    entry = stats.get(BLOOM_STATS_KEY)
    if not entry or column not in entry.get("cols", {}):
        return True
    if is_remote(root):
        rel = os.path.dirname(fragment_file)
        url = "/".join(p for p in (str(root).rstrip("/"), rel, entry["file"]) if p)
        payload = _load_remote_sidecar(
            url, tuple(sorted(storage_options.items())) if storage_options else None)
    else:
        sidecar = os.path.join(root, os.path.dirname(fragment_file),
                               entry["file"])
        payload = _load_sidecar(os.path.abspath(sidecar))
    if not payload or column not in payload:
        return True
    bf = BloomFilter.from_json(payload[column])
    return any(bf.might_contain(v) for v in values)


def parse_bloom_columns(raw: "str | list | tuple | None") -> "list[str]":
    if raw is None:
        return []
    if isinstance(raw, str):
        return [c.strip() for c in raw.split(",") if c.strip()]
    return [str(c) for c in raw]


def estimated_fpp(n_rows: int, bits_per_row: int = DEFAULT_BITS_PER_ROW,
                  max_bits: int = MAX_BITS) -> float:
    """Textbook fpp = (1 - e^{-kn/m})^k for the sizing this module picks."""
    m, k = _params(max(1, n_rows), bits_per_row, max_bits)
    return (1.0 - math.exp(-k * n_rows / m)) ** k
