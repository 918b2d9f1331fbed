"""Minimal in-test stand-in for the ``lance`` Python package.

The container has no native lance, so the native read/write twins
(``sources/reader._read_lance``, ``sources/writer._write_lance``) would
otherwise be dead code. This fake implements just the API surface those
twins call — ``dataset()``, ``fragment.write_fragments``,
``fragment.FragmentMetadata``, ``LanceOperation.Append/Overwrite``,
``LanceDataset.commit`` (signatures per the public pylance docs) — backed
by parquet files plus a JSON manifest, so the twins' real logic
(mapInArrow fragment fan-out, Arrow schema bridging, executor fragment
production, driver single-commit) executes end-to-end under test.

Ships to Spark workers via ``sparkContext.addPyFile`` (the scan/produce
closures re-import ``lance`` executor-side).
"""

from __future__ import annotations

import json
import os
import sys
import types
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST = "_mock_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _load_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as f:
        return json.load(f)


class FragmentMetadata:
    def __init__(self, fragment_id: int, file: str, rows: int):
        self.fragment_id = fragment_id
        self.file = file
        self.rows = rows

    def to_json(self) -> str:
        return json.dumps({"id": self.fragment_id, "file": self.file, "rows": self.rows})

    @staticmethod
    def from_json(j: str) -> "FragmentMetadata":
        d = json.loads(j)
        return FragmentMetadata(d["id"], d["file"], d["rows"])


def _write_fragments(table: pa.Table, path: str, max_rows_per_file: int = 1_000_000):
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    out = []
    start = 0
    while start < table.num_rows or (start == 0 and table.num_rows == 0):
        chunk = table.slice(start, max_rows_per_file)
        name = f"data/{uuid.uuid4().hex}.parquet"
        pq.write_table(chunk, os.path.join(path, name))
        out.append(FragmentMetadata(-1, name, chunk.num_rows))
        start += max_rows_per_file
        if table.num_rows == 0:
            break
    return out


class _Fragment:
    def __init__(self, root: str, fragment_id: int, file: str, rows: int):
        self._root = root
        self.fragment_id = fragment_id
        self._file = file
        self._rows = rows

    def count_rows(self) -> int:
        return self._rows

    def to_batches(self, columns=None, filter=None, batch_size: int = 1024):
        t = pq.read_table(os.path.join(self._root, self._file), columns=columns)
        if filter is not None:
            import pyarrow.dataset as pads

            t = pads.dataset(t).to_table(filter=_sql_filter(filter))
        yield from t.to_batches(max_chunksize=batch_size)


def _sql_filter(expr: str):
    # the twins only forward simple "<col> <op> <literal>" filter strings
    import pyarrow.dataset as pads

    col, op, lit = expr.split(maxsplit=2)
    lit = json.loads(lit.replace("'", '"'))
    f = pads.field(col)
    return {"=": f == lit, ">": f > lit, ">=": f >= lit,
            "<": f < lit, "<=": f <= lit, "<>": f != lit}[op]


class _Dataset:
    def __init__(self, path: str, version: int | None = None):
        m = _load_manifest(path)
        versions = m["versions"]
        self.version = version if version is not None else len(versions)
        self._root = path
        self._frags = [
            _Fragment(path, i, f["file"], f["rows"])
            for i, f in enumerate(versions[self.version - 1])
        ]

    @property
    def schema(self) -> pa.Schema:
        if not self._frags:
            return pa.schema([])
        return pq.read_schema(os.path.join(self._root, self._frags[0]._file))

    def get_fragments(self):
        return list(self._frags)

    def get_fragment(self, fid: int) -> _Fragment:
        return self._frags[fid]

    def count_rows(self) -> int:
        return sum(f._rows for f in self._frags)

    def create_index(self, column: str, index_type: str | None = None, **kwargs):
        """Records the call (pylance builds natively here); tests assert
        the parameter routing of index.build_index."""
        with open(os.path.join(self._root, "_fake_index.json"), "w") as f:
            json.dump({"column": column, "index_type": index_type, **kwargs}, f)


def dataset(path: str, version: int | None = None) -> _Dataset:
    return _Dataset(path, version)


class LanceOperation:
    class Append:
        def __init__(self, fragments):
            self.fragments = fragments

    class Overwrite:
        def __init__(self, schema, fragments):
            self.schema = schema
            self.fragments = fragments


class LanceDataset:
    @staticmethod
    def commit(path: str, op, read_version: int = 0):
        frags = [{"file": f.file, "rows": f.rows} for f in op.fragments]
        if os.path.exists(_manifest_path(path)):
            m = _load_manifest(path)
        else:
            m = {"versions": []}
        if isinstance(op, LanceOperation.Append):
            base = m["versions"][-1] if m["versions"] else []
            m["versions"].append(base + frags)
        else:
            m["versions"].append(frags)
        with open(_manifest_path(path), "w") as f:
            json.dump(m, f)


# expose ``lance.fragment`` as an importable submodule
fragment = types.ModuleType("lance.fragment")
fragment.write_fragments = _write_fragments
fragment.FragmentMetadata = FragmentMetadata
sys.modules["lance.fragment"] = fragment
