"""Property tests for the native Lance v2 codec: encode → decode is the
identity for every supported shape (hypothesis-generated tables), plus
deliberate edge cases the fixtures don't reach (empty tables, empty
strings everywhere, varint-boundary buffer sizes, single-row files).

No Spark session — the codec is pure Python, so these run in
milliseconds and shrink well.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_connector_lance_spark.sources import lance_format as LF

# text with unicode, empties, and characters whose UTF-8 length != char
# count — offset arithmetic must track BYTES
texts = st.one_of(st.none(), st.text(max_size=40))
blobs = st.one_of(st.none(), st.binary(max_size=40))
i64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
f32 = st.floats(width=32, allow_nan=False)  # NaN != NaN breaks equality asserts
floats_list = st.one_of(st.none(), st.lists(f32, max_size=8))
bools = st.booleans()
days = st.dates(min_value=datetime.date(1, 1, 1),
                max_value=datetime.date(9999, 12, 31))
timestamps = st.datetimes(min_value=datetime.datetime(1, 1, 1),
                          max_value=datetime.datetime(9999, 12, 31))


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=0, max_value=50))
    return pa.table({
        "i": pa.array(draw(st.lists(i64, min_size=n, max_size=n)), pa.int64()),
        "s": pa.array(draw(st.lists(texts, min_size=n, max_size=n)), pa.string()),
        "b": pa.array(draw(st.lists(blobs, min_size=n, max_size=n)), pa.binary()),
        "f": pa.array(draw(st.lists(bools, min_size=n, max_size=n)), pa.bool_()),
        "d": pa.array(draw(st.lists(days, min_size=n, max_size=n)), pa.date32()),
        "t": pa.array(draw(st.lists(timestamps, min_size=n, max_size=n)),
                      pa.timestamp("us")),
        "v": pa.array(draw(st.lists(floats_list, min_size=n, max_size=n)),
                      pa.list_(pa.float32())),
    })


@settings(max_examples=150, deadline=None)
@given(tables())
def test_encode_decode_roundtrip(tmp_path_factory, tbl):
    path = str(tmp_path_factory.mktemp("codec") / "t.lance")
    LF.write_native_file(tbl, path)
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()
    # the file is self-describing
    names = [f.name for f in LF.read_file_schema(path) if f.parent == -1]
    assert names == tbl.column_names


@settings(max_examples=60, deadline=None)
@given(tables())
def test_column_pruned_decode_matches_full(tmp_path_factory, tbl):
    path = str(tmp_path_factory.mktemp("codec") / "t.lance")
    LF.write_native_file(tbl, path)
    pruned = LF.read_native_file(path, columns=["v", "s"])
    assert pruned.column_names == ["v", "s"]
    assert pruned.to_pylist() == tbl.select(["v", "s"]).to_pylist()


def test_empty_table_roundtrip(tmp_path):
    tbl = pa.table({"i": pa.array([], pa.int64()),
                    "s": pa.array([], pa.string())})
    path = str(tmp_path / "empty.lance")
    LF.write_native_file(tbl, path)
    got = LF.read_native_file(path)
    assert got.num_rows == 0 and got.schema == tbl.schema


def test_varint_boundary_sizes(tmp_path):
    """Buffer sizes straddling the 1-byte/2-byte varint boundary (127/128
    bytes) and a >16KiB buffer (3-byte varint) — the packed offset/size
    lists must survive multi-byte varints."""
    for nbytes in (127, 128, 129, 20_000):
        s = "x" * nbytes
        tbl = pa.table({"s": pa.array([s], pa.string())})
        path = str(tmp_path / f"v{nbytes}.lance")
        LF.write_native_file(tbl, path)
        assert LF.read_native_file(path)["s"].to_pylist() == [s]


def test_manifest_roundtrip_many_fragments(tmp_path):
    """A manifest with enough fragments to push the message past the
    1-byte length prefix of every inner field."""
    root = str(tmp_path / "many")
    for i in range(12):
        LF.write_native_dataset(
            root, pa.table({"i": pa.array([i], pa.int64())}),
            mode="append")
    mf = LF.read_native_manifest(root)
    assert mf.version == 12 and len(mf.fragments) == 12
    assert sorted(LF.read_native_dataset(root)["i"].to_pylist()) == list(range(12))
    assert LF.native_count_rows(root, version=5) == 5


def test_nan_and_inf_floats_roundtrip(tmp_path):
    """NaN/±inf are bit-level payload for the flat encoder — they must
    round-trip exactly (list<float> carries them; equality is bitwise)."""
    import math
    import struct as _s

    vals = [float("nan"), float("inf"), float("-inf"), -0.0, 0.0]
    tbl = pa.table({"v": pa.array([vals], pa.list_(pa.float32()))})
    path = str(tmp_path / "nan.lance")
    LF.write_native_file(tbl, path)
    got = LF.read_native_file(path)["v"].to_pylist()[0]
    for a, b in zip(got, vals):
        assert _s.pack("<f", a) == _s.pack("<f", b), (a, b)
    assert math.isnan(got[0])
