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


def _log_op(path: str, entry: dict) -> None:
    """Append to the op log tests assert against (what a real dataset
    would have been asked to do)."""
    p = os.path.join(path, "_fake_ops.json")
    ops = json.load(open(p)) if os.path.exists(p) else []
    ops.append(entry)
    with open(p, "w") as f:
        json.dump(ops, f)


def _resolve(versions: list[dict], version: int | None) -> dict:
    if version is None:
        return versions[-1]
    for v in versions:
        if v["v"] == version:
            return v
    raise ValueError(f"version {version} not found (cleaned up?)")


class _Dataset:
    def __init__(self, path: str, version: int | None = None):
        m = _load_manifest(path)
        entry = _resolve(m["versions"], version)
        self.version = entry["v"]
        self._root = path
        self._frags = [
            _Fragment(path, i, f["file"], f["rows"])
            for i, f in enumerate(entry["frags"])
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

    def _commit_frags(self, frags: list[dict]) -> None:
        m = _load_manifest(self._root)
        m["versions"].append({"v": m["versions"][-1]["v"] + 1, "frags": frags})
        with open(_manifest_path(self._root), "w") as f:
            json.dump(m, f)

    def delete(self, predicate: str) -> None:
        """pylance ``dataset.delete(expr)``: row-level delete committing a
        new version."""
        out = []
        for fr in self._frags:
            t = pq.read_table(os.path.join(self._root, fr._file))
            kept = t.filter(~_sql_filter(predicate))
            if kept.num_rows == t.num_rows:
                out.append({"file": fr._file, "rows": fr._rows})
            elif kept.num_rows > 0:
                name = f"data/{uuid.uuid4().hex}.parquet"
                pq.write_table(kept, os.path.join(self._root, name))
                out.append({"file": name, "rows": kept.num_rows})
        self._commit_frags(out)
        _log_op(self._root, {"op": "delete", "predicate": predicate,
                             "read_version": self.version})

    def merge_insert(self, on: str) -> "_MergeInsert":
        return _MergeInsert(self, on)

    def add_columns(self, exprs: dict) -> None:
        """pylance ``add_columns({name: sql_expr})``: backfill computed
        columns (the real library appends column-only files; the fake
        rewrites — tests assert behavior, not IO shape). Expressions are
        evaluated with duckdb, standing in for pylance's datafusion."""
        import duckdb

        out = []
        for fr in self._frags:
            t = pq.read_table(os.path.join(self._root, fr._file))
            sel = ", ".join(f"{e} AS {n}" for n, e in exprs.items())
            con = duckdb.connect()
            con.register("t", t)
            t2 = con.execute(f"SELECT *, {sel} FROM t").arrow()
            con.close()
            name = f"data/{uuid.uuid4().hex}.parquet"
            pq.write_table(t2, os.path.join(self._root, name))
            out.append({"file": name, "rows": t2.num_rows})
        self._commit_frags(out)
        _log_op(self._root, {"op": "add_columns", "exprs": dict(exprs),
                             "read_version": self.version})

    def drop_columns(self, columns: list) -> None:
        """pylance ``drop_columns``: metadata-only in the real library;
        the fake rewrites without the columns (same visible result)."""
        out = []
        for fr in self._frags:
            t = pq.read_table(os.path.join(self._root, fr._file))
            t2 = t.drop_columns([c for c in columns if c in t.schema.names])
            name = f"data/{uuid.uuid4().hex}.parquet"
            pq.write_table(t2, os.path.join(self._root, name))
            out.append({"file": name, "rows": t2.num_rows})
        self._commit_frags(out)
        _log_op(self._root, {"op": "drop_columns", "columns": list(columns),
                             "read_version": self.version})

    def cleanup_old_versions(self, older_than=None, delete_unverified=False):
        """pylance ``cleanup_old_versions``: drop all versions but the
        newest, delete data files only the dropped versions referenced."""
        m = _load_manifest(self._root)
        keep = m["versions"][-1]
        dropped = [v for v in m["versions"] if v["v"] != keep["v"]]
        live = {f["file"] for f in keep["frags"]}
        dead = {f["file"] for v in dropped for f in v["frags"]} - live
        removed_bytes = 0
        for rel in dead:
            p = os.path.join(self._root, rel)
            if os.path.exists(p):
                removed_bytes += os.path.getsize(p)
                os.remove(p)
        m["versions"] = [keep]
        with open(_manifest_path(self._root), "w") as f:
            json.dump(m, f)
        _log_op(self._root, {"op": "cleanup_old_versions",
                             "old_versions": len(dropped),
                             "delete_unverified": bool(delete_unverified)})
        return types.SimpleNamespace(bytes_removed=removed_bytes,
                                     old_versions=len(dropped))


class _MergeInsert:
    """Builder mirroring pylance's merge_insert chain; tests assert the
    clauses the twin enabled."""

    def __init__(self, ds: _Dataset, on: str):
        self._ds = ds
        self._on = on
        self._update_matched = False
        self._insert_unmatched = False

    def when_matched_update_all(self) -> "_MergeInsert":
        self._update_matched = True
        return self

    def when_not_matched_insert_all(self) -> "_MergeInsert":
        self._insert_unmatched = True
        return self

    def execute(self, table: pa.Table) -> None:
        import pyarrow.compute as pc

        ds = self._ds
        keys = table.column(self._on)
        out = []
        for fr in ds._frags:
            t = pq.read_table(os.path.join(ds._root, fr._file))
            survivors = t.filter(pc.invert(pc.is_in(t.column(self._on), value_set=keys)))
            if survivors.num_rows == t.num_rows:
                out.append({"file": fr._file, "rows": fr._rows})
            elif survivors.num_rows > 0:
                name = f"data/{uuid.uuid4().hex}.parquet"
                pq.write_table(survivors, os.path.join(ds._root, name))
                out.append({"file": name, "rows": survivors.num_rows})
        name = f"data/{uuid.uuid4().hex}.parquet"
        schema = pq.read_schema(os.path.join(ds._root, ds._frags[0]._file))
        pq.write_table(table.select(schema.names).cast(schema), os.path.join(ds._root, name))
        out.append({"file": name, "rows": table.num_rows})
        ds._commit_frags(out)
        _log_op(ds._root, {"op": "merge_insert", "on": self._on,
                           "when_matched_update_all": self._update_matched,
                           "when_not_matched_insert_all": self._insert_unmatched,
                           "update_rows": table.num_rows,
                           "read_version": ds.version})


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
        next_v = m["versions"][-1]["v"] + 1 if m["versions"] else 1
        if isinstance(op, LanceOperation.Append):
            base = m["versions"][-1]["frags"] if m["versions"] else []
            m["versions"].append({"v": next_v, "frags": base + frags})
        else:
            m["versions"].append({"v": next_v, "frags": frags})
        with open(_manifest_path(path), "w") as f:
            json.dump(m, f)


# expose ``lance.fragment`` as an importable submodule
fragment = types.ModuleType("lance.fragment")
fragment.write_fragments = _write_fragments
fragment.FragmentMetadata = FragmentMetadata
sys.modules["lance.fragment"] = fragment
