"""Property tests for the native Lance v2 codec: encode → decode is the
identity for every supported shape (hypothesis-generated tables), plus
deliberate edge cases the fixtures don't reach (empty tables, empty
strings everywhere, varint-boundary buffer sizes, single-row files).

No Spark session — the codec is pure Python, so these run in
milliseconds and shrink well.
"""

from __future__ import annotations

import datetime
import math
import os

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
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


# nullable twins: every fixed-width/bool/struct/FSL shape must survive
# the Nullable.some_nulls / all_nulls page arms (round-10 write surface)
opt_i64 = st.one_of(st.none(), i64)
opt_bool = st.one_of(st.none(), bools)
opt_ts = st.one_of(st.none(), timestamps)
opt_struct = st.one_of(
    st.none(),
    st.fixed_dictionaries({"a": opt_i64, "b": texts}))
opt_vec2 = st.one_of(st.none(), st.lists(f32, min_size=2, max_size=2))


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=0, max_value=50))
    return pa.table({
        "i": pa.array(draw(st.lists(opt_i64, min_size=n, max_size=n)),
                      pa.int64()),
        "s": pa.array(draw(st.lists(texts, min_size=n, max_size=n)), pa.string()),
        "b": pa.array(draw(st.lists(blobs, min_size=n, max_size=n)), pa.binary()),
        "f": pa.array(draw(st.lists(opt_bool, min_size=n, max_size=n)),
                      pa.bool_()),
        "d": pa.array(draw(st.lists(days, min_size=n, max_size=n)), pa.date32()),
        "t": pa.array(draw(st.lists(opt_ts, min_size=n, max_size=n)),
                      pa.timestamp("us")),
        "v": pa.array(draw(st.lists(floats_list, min_size=n, max_size=n)),
                      pa.list_(pa.float32())),
        "m": pa.array(draw(st.lists(opt_struct, min_size=n, max_size=n)),
                      pa.struct([pa.field("a", pa.int64()),
                                 pa.field("b", pa.string())])),
        "w": pa.array(draw(st.lists(opt_vec2, min_size=n, max_size=n)),
                      pa.list_(pa.field("item", pa.float32()), 2)),
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


def test_list_child_name_survives_manifest_roundtrip(tmp_path):
    """manifest -> arrow -> fields must not rename a list's element field
    (regression: arrow_type_for built pa.list_(<type>), defaulting the
    child to 'item', so appends to a dataset whose child is 'element' —
    Spark's own Arrow naming — were spuriously rejected with 'append
    schema mismatch')."""
    root = str(tmp_path / "ds")
    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "vec": pa.array([[1.0, 2.0], [3.0, 4.0]],
                        pa.list_(pa.field("element", pa.float32()))),
    })
    fields = LF.fields_of_arrow_schema(tbl.schema)
    assert fields[2].name == "element"
    sch = LF.arrow_schema_of(fields)
    assert sch.field("vec").type.value_field.name == "element"
    rt = LF.fields_of_arrow_schema(sch)
    assert LF._schema_shape(rt) == LF._schema_shape(fields)

    # end-to-end: create then append through commit_native — the append
    # compares schema shapes against the live manifest
    import os

    data_dir = os.path.join(root, LF.DATA_DIR)
    os.makedirs(data_dir)
    LF.write_native_file(tbl, os.path.join(data_dir, "a.lance"))
    LF.commit_native(root, fields, [("a.lance", 2, None)], "overwrite")
    live = LF.read_native_manifest(root)
    aligned = LF.align_to_fields(tbl, live.fields)
    LF.write_native_file(aligned, os.path.join(data_dir, "b.lance"))
    LF.commit_native(root, LF.fields_of_arrow_schema(aligned.schema),
                     [("b.lance", 2, None)], "append")
    assert LF.read_native_dataset(root).num_rows == 4


def _tiny(n=2, base=0):
    return pa.table({"id": pa.array(range(base, base + n), pa.int64())})


def test_commit_native_cas_conflict(tmp_path):
    """expected_base_version is a compare-and-swap: a maintenance rewrite
    whose fragment list was derived from a snapshot must NOT land on a
    moved head (a blind retry would silently drop the concurrent
    append's fragments)."""
    from flink_connector_lance_spark.sources.fragments import CommitConflict

    root = str(tmp_path / "ds")
    LF.write_native_dataset(root, _tiny(), "create")
    mf = LF.read_native_manifest(root)
    LF.write_native_dataset(root, _tiny(base=10), "append")  # head moves
    fields = mf.fields
    with pytest.raises(CommitConflict):
        LF.commit_native(root, fields,
                         [(mf.fragments[0].file, 2, None)], "overwrite",
                         expected_base_version=mf.version)
    # pinned to the CURRENT head it lands
    live = LF.read_native_manifest(root)
    out = LF.commit_native(root, fields,
                           [(mf.fragments[0].file, 2, None)], "overwrite",
                           expected_base_version=live.version)
    assert out.version == live.version + 1
    # the refused commit left no orphan transaction file
    import os
    txns = os.listdir(os.path.join(root, "_transactions"))
    manifests = LF.native_manifest_versions(root)
    assert len(txns) == len(manifests)


def test_commit_native_lost_race_collects_txn(tmp_path, monkeypatch):
    """A committer that loses the O_EXCL manifest race must remove the
    txn file it wrote for that round — orphan txns referencing a
    manifest version that never existed otherwise accrete one per
    retry. The race is injected between the version read and the
    manifest create (a concurrent winner steals the slot)."""
    import os
    import shutil

    root = str(tmp_path / "ds")
    LF.write_native_dataset(root, _tiny(), "create")
    mf = LF.read_native_manifest(root)
    vdir = os.path.join(root, LF.VERSIONS_DIR)
    nxt = mf.version + 1

    orig = LF._txn_bytes
    fired = {"done": False}

    def steal_slot(*a, **k):
        # runs after commit_native read the version list, before the
        # O_EXCL manifest create — exactly where a concurrent winner
        # would land
        if not fired["done"]:
            fired["done"] = True
            shutil.copyfile(os.path.join(vdir, f"{mf.version}.manifest"),
                            os.path.join(vdir, f"{nxt}.manifest"))
        return orig(*a, **k)

    monkeypatch.setattr(LF, "_txn_bytes", steal_slot)
    before = set(os.listdir(os.path.join(root, "_transactions")))
    out = LF.commit_native(root, mf.fields,
                           [(mf.fragments[0].file, 2, None)], "append")
    after = set(os.listdir(os.path.join(root, "_transactions")))
    assert out.version == nxt + 1  # lost nxt, won nxt+1
    new_txns = after - before
    # the losing round's txn was collected; exactly one (the winner's)
    # survives. (Its read-version prefix reflects the placeholder's
    # embedded version — a copy in this test — so only count is pinned.)
    assert len(new_txns) == 1


# --- struct columns (spec: SimpleStruct header + member columns) ----------

def test_struct_roundtrip(tmp_path):
    """Struct encode->decode is the identity: zero-buffer header page,
    members as their own structural columns (the reference's converter
    carries StructType — ref LanceTypeConverter.java:179-186)."""
    p = str(tmp_path / "s.lance")
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "meta": pa.array(
            [{"w": 10, "tag": "a"}, {"w": 20, "tag": None}, {"w": 30, "tag": "c"}],
            pa.struct([pa.field("w", pa.int64()), pa.field("tag", pa.string())])),
    })
    LF.write_native_file(tbl, p)
    got = LF.read_native_file(p)
    assert got.equals(tbl)
    # projection still prunes: selecting only 'id' never touches meta
    assert LF.read_native_file(p, columns=["id"]).column_names == ["id"]
    # schema survives the file's own descriptor
    fields = LF.read_file_schema(p)
    assert [(f.name, f.logical_type, f.parent) for f in fields] == [
        ("id", "int64", -1), ("meta", "struct", -1),
        ("w", "int64", fields[1].id), ("tag", "string", fields[1].id)]


def test_struct_nested_and_list_member_roundtrip(tmp_path):
    p = str(tmp_path / "n.lance")
    inner = pa.struct([pa.field("x", pa.float64())])
    tbl = pa.table({
        "s": pa.array(
            [{"pos": {"x": 1.5}, "tags": ["a", "b"]},
             {"pos": {"x": 2.5}, "tags": None}],
            pa.struct([pa.field("pos", inner),
                       pa.field("tags", pa.list_(pa.string()))])),
    })
    LF.write_native_file(tbl, p)
    assert LF.read_native_file(p).equals(tbl)


def test_struct_dataset_roundtrip_and_append(tmp_path):
    root = str(tmp_path / "ds")
    t = pa.table({
        "id": pa.array([1], pa.int64()),
        "m": pa.array([{"a": 1}], pa.struct([pa.field("a", pa.int64())])),
    })
    LF.write_native_dataset(root, t, "create")
    LF.write_native_dataset(root, t, "append")
    got = LF.read_native_dataset(root)
    assert got.num_rows == 2 and got.column("m").to_pylist() == [{"a": 1}] * 2


def test_struct_null_values_roundtrip(tmp_path):
    """NULL struct VALUES ride a Nullable.some_nulls header (one
    validity-bitmap buffer); members still write a value per row and
    the header masks them on decode. Nested member nulls compose."""
    p = str(tmp_path / "x.lance")
    tbl = pa.table({
        "m": pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": None}],
                      pa.struct([pa.field("a", pa.int64()),
                                 pa.field("b", pa.string())])),
    })
    LF.write_native_file(tbl, p)
    assert LF.read_native_file(p).column("m").to_pylist() == \
        [{"a": 1, "b": "x"}, None, {"a": None, "b": None}]


# --- fixed-size lists (declared-dimension vectors) -------------------------

def test_fixed_size_list_roundtrip(tmp_path):
    """A DECLARED dimension keeps FixedSizeList fidelity through the
    codec (SURVEY §7.0.3 — the improvement over the reference's lossy
    List flatten; Lance ANN indexing requires FSL): zero-buffer header
    page carrying the dimension, flattened values in the child column."""
    p = str(tmp_path / "v.lance")
    fsl = pa.list_(pa.field("item", pa.float32()), 4)
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "vec": pa.array([[1.0, 2.0, 3.0, 4.0],
                         [5.0, 6.0, 7.0, 8.0],
                         [9.0, 10.0, 11.0, 12.0]], fsl),
    })
    LF.write_native_file(tbl, p)
    got = LF.read_native_file(p)
    assert got.schema == tbl.schema  # FSL type survives, not a plain list
    assert got.equals(tbl)
    fields = LF.read_file_schema(p)
    assert fields[1].logical_type == "fixed_size_list:4"
    # dataset round trip + append schema check
    root = str(tmp_path / "ds")
    LF.write_native_dataset(root, tbl, "create")
    LF.write_native_dataset(root, tbl, "append")
    assert LF.read_native_dataset(root).num_rows == 6
    # a PLAIN list append into an FSL column is a schema mismatch (loud)
    plain = pa.table({
        "id": pa.array([9], pa.int64()),
        "vec": pa.array([[1.0, 2.0, 3.0, 4.0]], pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="schema mismatch"):
        LF.write_native_dataset(root, plain, "append")


def test_fixed_size_list_null_vector_roundtrip(tmp_path):
    """NULL vector rows keep their dim child slots (.values, not
    .flatten()) under a Nullable.some_nulls header — the rows*dim child
    contract survives, and the header's validity restores the Nones."""
    p = str(tmp_path / "x.lance")
    fsl = pa.list_(pa.field("item", pa.float32()), 2)
    tbl = pa.table({"v": pa.array([[1.0, 2.0], None, [3.0, 4.0]], fsl)})
    LF.write_native_file(tbl, p)
    assert LF.read_native_file(p).column("v").to_pylist() == \
        [[1.0, 2.0], None, [3.0, 4.0]]
    # all-null column: AllNull page, zero buffers
    p2 = str(tmp_path / "y.lance")
    tbl2 = pa.table({"v": pa.array([None, None], fsl),
                     "i": pa.array([None, None], pa.int64())})
    LF.write_native_file(tbl2, p2)
    assert LF.read_native_file(p2).to_pylist() == \
        [{"v": None, "i": None}, {"v": None, "i": None}]


def test_plain_list_still_writes_list(tmp_path):
    """No declared dimension -> the fixture-pinned List layout, so
    re-encoding the reference fixtures stays byte-identical."""
    p = str(tmp_path / "l.lance")
    tbl = pa.table({"v": pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float32()))})
    LF.write_native_file(tbl, p)
    fields = LF.read_file_schema(p)
    assert fields[0].logical_type == "list"
    assert LF.read_native_file(p).equals(tbl)


# --- multi-page columns ------------------------------------------------------

def _paged_sample():
    return pa.table({
        "i": pa.array(range(10), pa.int64()),
        "s": pa.array([None if i % 4 == 0 else f"s{'x' * i}{i}" for i in range(10)],
                      pa.string()),
        "b": pa.array([bytes([i]) for i in range(10)], pa.binary()),
        "f": pa.array([i % 2 == 0 for i in range(10)], pa.bool_()),
        "v": pa.array([None if i % 5 == 0 else [float(i)] * (i % 3)
                       for i in range(10)], pa.list_(pa.float32())),
    })


@pytest.mark.parametrize("page_rows", [1, 3, 4, 10, 100])
def test_multi_page_roundtrip(tmp_path, page_rows):
    """Multi-page columns (lance's layout past its page-size threshold)
    decode for every supported type: pages are self-contained
    (page-local offsets, per-page null adjustment); list pages advance a
    base into the child column's concatenated values."""
    p = str(tmp_path / f"p{page_rows}.lance")
    tbl = _paged_sample()
    LF.write_native_file(tbl, p, page_rows=page_rows)
    got = LF.read_native_file(p)
    assert got.to_pylist() == tbl.to_pylist()
    assert got.schema == tbl.schema
    # projection pruning still holds page-wise
    assert LF.read_native_file(p, columns=["s"]).to_pylist() == \
        tbl.select(["s"]).to_pylist()


def test_multi_page_struct_and_fsl(tmp_path):
    p = str(tmp_path / "pn.lance")
    tbl = pa.table({
        "m": pa.array([{"a": i, "t": f"t{i}"} for i in range(7)],
                      pa.struct([pa.field("a", pa.int64()),
                                 pa.field("t", pa.string())])),
        "vec": pa.array([[float(i), float(i + 1)] for i in range(7)],
                        pa.list_(pa.field("item", pa.float32()), 2)),
    })
    LF.write_native_file(tbl, p, page_rows=3)
    assert LF.read_native_file(p).to_pylist() == tbl.to_pylist()


def test_multi_page_dataset_through_spark(spark, tmp_path):
    """A dataset whose fragment carries multi-page columns reads through
    the distributed scan and the DataSource like any other."""
    import os

    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )

    root = str(tmp_path / "ds")
    os.makedirs(os.path.join(root, LF.DATA_DIR))
    tbl = _paged_sample()
    LF.write_native_file(tbl, os.path.join(root, LF.DATA_DIR, "a.lance"),
                         page_rows=3)
    LF.commit_native(root, LF.fields_of_arrow_schema(tbl.schema),
                     [("a.lance", tbl.num_rows, None)], "create")
    register_lance_datasource(spark)
    got = spark.read.format("lance").load(root)
    assert got.count() == 10
    assert got.filter("s IS NULL").count() == 3


# --- round-9 property net: struct/FSL columns, paged layouts ----------------

structs = st.builds(
    lambda a, t: {"a": a, "t": t},
    st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
    texts,
)


@st.composite
def round9_tables(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    dim = draw(st.integers(min_value=1, max_value=6))
    fsl = pa.list_(pa.field("item", pa.float32()), dim)
    return pa.table({
        "i": pa.array(draw(st.lists(i64, min_size=n, max_size=n)), pa.int64()),
        "m": pa.array(draw(st.lists(structs, min_size=n, max_size=n)),
                      pa.struct([pa.field("a", pa.int32()),
                                 pa.field("t", pa.string())])),
        "vec": pa.array(
            [draw(st.lists(f32, min_size=dim, max_size=dim)) for _ in range(n)],
            fsl),
        "tags": pa.array(draw(st.lists(
            # plain st.text (no .filter) — a rejection-sampling strategy
            # here tripped hypothesis's filter_too_much health check
            # under unlucky seeds in full-suite runs (seed differs per
            # run, so the flake never reproduced in isolation)
            st.one_of(st.none(), st.lists(st.text(max_size=40), max_size=3)),
            min_size=n, max_size=n)), pa.list_(pa.string())),
    })


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(round9_tables(), st.sampled_from([None, 1, 3, 7]))
def test_round9_encodings_roundtrip(tmp_path_factory, tbl, page_rows):
    """Struct, fixed-size-list, and nullable list-of-string columns
    round-trip through the codec at every page split — the property net
    over the round-9 encoders (SimpleStruct headers, FSL headers,
    multi-page self-contained pages)."""
    path = str(tmp_path_factory.mktemp("r9") / "t.lance")
    LF.write_native_file(tbl, path, page_rows=page_rows)
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()
    # projection pruning composes with every layout
    pruned = LF.read_native_file(path, columns=["m", "vec"])
    assert pruned.to_pylist() == tbl.select(["m", "vec"]).to_pylist()


# --- 2.1 mini-block structural pages ----------------------------------------
#
# Field-number / chunk-framing contract documented at
# lance_format._decode_miniblock: verified by encode->decode round-trips
# (no 2.1 fixture or installable lance exists in this environment) plus
# loud refusals for every arm the reconstruction cannot justify.

mb_i64 = st.lists(opt_i64, max_size=600)


@settings(max_examples=80, deadline=None)
@given(st.lists(opt_i64, max_size=600), st.lists(opt_bool, max_size=40))
def test_miniblock_roundtrip(tmp_path_factory, ints, flags):
    n = len(ints)
    tbl = pa.table({
        "i": pa.array(ints, pa.int64()),
        "f": pa.array((flags * ((n // max(len(flags), 1)) + 1))[:n]
                      if flags else [None] * n, pa.bool_()),
        "t": pa.array([v % 10_000 if v is not None else None
                       for v in ints], pa.timestamp("us")),
        "s": pa.array([None if v is None else f"s{v % 97}"
                       for v in ints], pa.string()),  # stays a 2.0 page
    })
    path = str(tmp_path_factory.mktemp("mb") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_chunking_and_pruning(tmp_path):
    """>256 rows spill into multiple power-of-two chunks with a
    non-power-of-two tail; column pruning never touches unselected
    columns' chunk buffers (independent page buffers)."""
    n = 1000  # 3 x 256-value chunks + a 232-value tail
    tbl = pa.table({
        "a": pa.array(range(n), pa.int64()),
        "b": pa.array([v if v % 3 else None for v in range(n)], pa.int32()),
    })
    p = str(tmp_path / "t.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock")
    assert LF.read_native_file(p).to_pylist() == tbl.to_pylist()
    assert LF.read_native_file(p, columns=["b"]).to_pylist() == \
        tbl.select(["b"]).to_pylist()
    # paging composes: each page re-chunks independently
    p2 = str(tmp_path / "t2.lance")
    LF.write_native_file(tbl, p2, page_rows=300, structural="2.1-miniblock")
    assert LF.read_native_file(p2).to_pylist() == tbl.to_pylist()


@settings(max_examples=60, deadline=None)
@given(st.lists(texts, max_size=600), st.lists(blobs, max_size=600))
def test_miniblock_variable_roundtrip(tmp_path_factory, strs, bins):
    """String/binary columns under the 2.1 variable-width mini-block
    layout: per-chunk u32 length stream + bytes, unicode byte-length
    arithmetic, nulls on the definition-level stream, empties."""
    n = max(len(strs), len(bins))
    tbl = pa.table({
        "s": pa.array((strs + [None] * n)[:n], pa.string()),
        "b": pa.array((bins + [None] * n)[:n], pa.binary()),
    })
    path = str(tmp_path_factory.mktemp("mbv") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


@settings(max_examples=60, deadline=None)
@given(st.lists(opt_i64, max_size=600),
       st.lists(st.one_of(st.none(),
                          st.integers(min_value=0, max_value=10 ** 9)),
                max_size=600))
def test_miniblock_bitpack_roundtrip(tmp_path_factory, full_range, small):
    """Inline-bitpacked integer value streams: full-range i64 chunks
    (negatives force raw two's complement at type width), small
    non-negative chunks pack at their max bit length — both arms must
    round-trip exactly, including nulls and the per-chunk width word."""
    n = max(len(full_range), len(small))
    tbl = pa.table({
        "w": pa.array((full_range + [None] * n)[:n], pa.int64()),
        "n32": pa.array((small + [None] * n)[:n], pa.int32()),
    })
    path = str(tmp_path_factory.mktemp("mbp") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_bitpack_shrinks_storage(tmp_path):
    """The point of the bitpacked stream: small-domain int64 columns
    write a fraction of the flat 2.0 bytes (100k values in 0..99 pack at
    7 bits -> ~8x file-level shrink after framing overhead)."""
    small = pa.table({"i": pa.array([v % 100 for v in range(100_000)],
                                    pa.int64())})
    p20 = str(tmp_path / "s20.lance")
    p21 = str(tmp_path / "s21.lance")
    LF.write_native_file(small, p20)
    LF.write_native_file(small, p21, structural="2.1-miniblock")
    import os
    assert os.path.getsize(p21) < os.path.getsize(p20) / 4
    assert LF.read_native_file(p21).to_pylist() == small.to_pylist()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.sampled_from(["en", "de", "fr", "", "中文"])),
                max_size=600),
       st.integers(min_value=0, max_value=3))
def test_miniblock_dictionary_roundtrip(tmp_path_factory, vals, extra):
    """Low-cardinality string/binary columns dictionary-encode under the
    2.1 layout (items buffer + inline-bitpacked index stream): values,
    nulls, empty strings, and unicode must all survive the indirection."""
    n = len(vals)
    tbl = pa.table({
        "s": pa.array(vals, pa.string()),
        "b": pa.array([None if v is None else v.encode("utf-8")
                       for v in vals], pa.binary()),
    })
    path = str(tmp_path_factory.mktemp("mbd") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_dictionary_shrinks_storage(tmp_path):
    """The point of the dictionary: a 'lang'-like column (8 distinct
    values over 5k rows) stores each distinct string once per page —
    >8x smaller than the 2.0 offsets+bytes layout when no nulls force a
    definition stream."""
    langs = ["en", "de", "fr", "zh", "es", "ru", "ja", "pt"]
    lo = pa.table({"lang": pa.array([langs[v % 8] for v in range(5000)],
                                    pa.string())})
    p20 = str(tmp_path / "l20.lance")
    p21 = str(tmp_path / "l21.lance")
    LF.write_native_file(lo, p20)
    LF.write_native_file(lo, p21, structural="2.1-miniblock")
    import os
    assert os.path.getsize(p21) < os.path.getsize(p20) / 8
    assert LF.read_native_file(p21).to_pylist() == lo.to_pylist()
    # high-cardinality columns must NOT dictionary-encode (the page
    # would store every value twice): unique strings stay on the plain
    # variable-width mini-block and round-trip identically
    hi = pa.table({"s": pa.array([f"unique-{v}" for v in range(2000)],
                                 pa.string())})
    ph = str(tmp_path / "hi.lance")
    LF.write_native_file(hi, ph, structural="2.1-miniblock")
    assert LF.read_native_file(ph).to_pylist() == hi.to_pylist()


def test_fullzip_large_values_roundtrip(tmp_path):
    """A column with any value above the mini-block budget auto-routes
    to the FULL-ZIP layout (per-item zipped [def][len][bytes] records);
    values beyond the u16 chunk-word ceiling (32KiB) must survive —
    full-zip has no per-chunk framing to overflow."""
    n = 300
    tbl = pa.table({
        "big": pa.array([("x" * 40_000 if v % 90 == 0 else
                          None if v % 7 == 0 else f"t{v}")
                         for v in range(n)], pa.string()),
        "bigb": pa.array([bytes([v % 256]) * 5000 if v % 50 == 0 else b"z"
                          for v in range(n)], pa.binary()),
        "i": pa.array(range(n), pa.int64()),  # mixes layouts per page
    })
    p = str(tmp_path / "fz.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock")
    got = LF.read_native_file(p)
    assert got.to_pylist() == tbl.to_pylist()
    # pruning composes across mixed layouts
    assert LF.read_native_file(p, columns=["big"]).to_pylist() == \
        tbl.select(["big"]).to_pylist()
    # paging composes
    p2 = str(tmp_path / "fz2.lance")
    LF.write_native_file(tbl, p2, page_rows=100, structural="2.1-miniblock")
    assert LF.read_native_file(p2).to_pylist() == tbl.to_pylist()


def test_miniblock_refusals_are_loud(tmp_path):
    """Every 2.1 arm beyond the reconstruction refuses BY NAME: full-zip
    layout, compressed streams, dictionaries, deep repdef layers, and
    structural pages on non-fixed-width columns."""
    import flink_connector_lance_spark.sources.lance_format as LFm

    # build a valid miniblock file, then corrupt the layout message shape
    tbl = pa.table({"i": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "ok.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock")

    def rewrite(layout_bytes):
        blob = bytearray(open(p, "rb").read())
        # decode helpers: replay write path with a patched encoding
        import struct as _s
        (cms, cmos, gbos, num_global, num_cols, _maj, _min) = _s.unpack_from(
            "<QQQIIHH", blob, len(blob) - LFm.FOOTER_LEN)
        pos, size = _s.unpack_from("<QQ", blob, cmos)
        return blob, pos, size

    # full-zip arm (PageLayout f2)
    fz = LFm._w_len(2, b"")
    # compressed value stream (CompressiveEncoding arm f9)
    comp = LFm._w_len(1, LFm._w_len(3, LFm._w_len(9, b"")) +
                      LFm._w_packed(4, [1]))
    # dictionary arm (MiniBlockLayout f5)
    dic = LFm._w_len(1, LFm._w_len(3, LFm._enc_compressive_flat(64)) +
                     LFm._w_packed(4, [1]) + LFm._w_len(5, b""))
    # deep repdef layers
    deep = LFm._w_len(1, LFm._w_len(3, LFm._enc_compressive_flat(64)) +
                      LFm._w_packed(4, [2, 3]))
    cases = [(fz, "full-zip"), (comp, "compression scheme"),
             (dic, "dictionary"), (deep, "repdef layers")]
    for layout, needle in cases:
        q = str(tmp_path / f"bad-{needle.split()[0]}.lance")
        plan = LFm._plan_miniblock_flat(pa.array([1, 2, 3], pa.int64()),
                                        "int64", "column 'i' (int64)")
        plan.encoding = layout
        # hand-assemble a one-column file around the patched plan
        import flink_connector_lance_spark.sources.lance_format as L
        fields = L.fields_of_arrow_schema(tbl.schema)
        blob = bytearray()
        bufpos = []
        for b in plan.buffers:
            pad = (-len(blob)) % 64
            blob.extend(b"\x48" * pad)
            bufpos.append(len(blob))
            blob.extend(b)
        schema_msg = b"".join(L._w_len(1, L._field_bytes(f)) for f in fields)
        fd = L._w_len(1, schema_msg) + L._w_vint(2, 3)
        pad = (-len(blob)) % 64
        blob.extend(b"\x48" * pad)
        gpos = len(blob)
        blob.extend(fd)
        col_enc = L._w_len(1, L._w_any(L._COL_ENC_URL, L._w_len(1, b"")))
        cm = col_enc + L._w_len(2, (
            L._w_packed(1, bufpos) +
            L._w_packed(2, [len(b) for b in plan.buffers]) +
            L._w_vint(3, plan.length) +
            L._w_len(4, L._w_any(L._PAGE_LAYOUT_URL, plan.encoding))))
        cm_off = len(blob)
        blob.extend(cm)
        import struct as _s
        cmos = len(blob)
        blob.extend(_s.pack("<QQ", cm_off, len(cm)))
        gbos = len(blob)
        blob.extend(_s.pack("<QQ", gpos, len(fd)))
        blob.extend(_s.pack("<QQQIIHH", cm_off, cmos, gbos, 1, 1, 0, 3))
        blob.extend(LF.MAGIC)
        open(q, "wb").write(bytes(blob))
        with pytest.raises(NotImplementedError, match=needle):
            LF.read_native_file(q)


# --- 2.1 round-11 arms: RLE / byte-stream-split / zlib blocks / repdef lists


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-3, max_value=3)),
                max_size=600),
       st.integers(min_value=1, max_value=64))
def test_miniblock_rle_roundtrip(tmp_path_factory, vals, stretch):
    """Run-heavy integer columns auto-select the RLE value stream
    ([u16 run count][run values][u16 lengths] per chunk) and round-trip
    exactly — including nulls (zero-filled under the definition stream),
    negatives, and runs crossing chunk boundaries."""
    stretched = [v for v in vals for _ in range(stretch)]
    tbl = pa.table({"r": pa.array(stretched, pa.int64()),
                    "r16": pa.array([None if v is None else v + 3
                                     for v in stretched], pa.int16())})
    path = str(tmp_path_factory.mktemp("rle") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_rle_shrinks_storage(tmp_path):
    """The point of RLE: a sorted/categorical int64 column (avg run 50)
    writes far below both the flat 2.0 bytes AND the bitpacked stream."""
    runs = pa.table({"g": pa.array([v // 50 for v in range(100_000)],
                                   pa.int64())})
    p20 = str(tmp_path / "r20.lance")
    p21 = str(tmp_path / "r21.lance")
    LF.write_native_file(runs, p20)
    LF.write_native_file(runs, p21, structural="2.1-miniblock")
    import os
    assert os.path.getsize(p21) < os.path.getsize(p20) / 20
    assert LF.read_native_file(p21).to_pylist() == runs.to_pylist()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                               width=64)),
                max_size=600))
def test_miniblock_zlib_and_bss_roundtrip(tmp_path_factory, floats):
    """write.native-compression=zlib: float columns byte-stream-split
    then zlib-wrap each chunk's value stream; int and string columns
    compose their own arms under the same knob. Level streams stay
    uncompressed. Everything round-trips exactly."""
    n = len(floats)
    tbl = pa.table({
        "f": pa.array(floats, pa.float64()),
        "f32": pa.array([None if v is None or not math.isfinite(v)
                         else float(int(v) % 100)
                         for v in floats], pa.float32()),
        "i": pa.array([None if v is None or not math.isfinite(v)
                       else int(v) % 1000
                       for v in floats], pa.int64()),
        "s": pa.array([None if v is None
                       else f"val-{int(v) % 7 if math.isfinite(v) else 'x'}"
                       f"-{i}"
                       for i, v in enumerate(floats)], pa.string()),
    })
    path = str(tmp_path_factory.mktemp("zl") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock",
                         compression="zlib")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_zlib_shrinks_storage(tmp_path):
    """zlib blocks shrink compressible value streams: a repetitive
    high-cardinality string column (dictionary doesn't apply) compresses
    several-fold; byte-stream-split floats from a small value domain
    compress too (same-position bytes adjacent)."""
    import os

    n = 20_000
    tbl = pa.table({
        "s": pa.array([f"prefix-prefix-prefix-{v}" for v in range(n)],
                      pa.string()),
        "f": pa.array([float(v % 16) for v in range(n)], pa.float64()),
    })
    p_raw = str(tmp_path / "raw.lance")
    p_zip = str(tmp_path / "zip.lance")
    LF.write_native_file(tbl, p_raw, structural="2.1-miniblock")
    LF.write_native_file(tbl, p_zip, structural="2.1-miniblock",
                         compression="zlib")
    assert os.path.getsize(p_zip) < os.path.getsize(p_raw) / 2
    assert LF.read_native_file(p_zip).to_pylist() == tbl.to_pylist()


list_rows = st.lists(
    st.one_of(st.none(),
              st.lists(st.one_of(st.none(), st.integers(
                  min_value=-2**40, max_value=2**40)), max_size=12)),
    max_size=300)


@settings(max_examples=60, deadline=None)
@given(list_rows)
def test_miniblock_list_repdef_roundtrip(tmp_path_factory, rows):
    """Nested repdef: list<int64> and list<string> columns collapse into
    single structural pages whose chunks carry [repetition][definition]
    [values] streams — null lists, empty lists, null items, and rows
    spanning chunk boundaries all round-trip; projection still prunes."""
    srows = [None if r is None else [None if x is None else f"s{x % 13}"
                                     for x in r] for r in rows]
    tbl = pa.table({
        "li": pa.array(rows, pa.list_(pa.int64())),
        "ls": pa.array(srows, pa.list_(pa.string())),
        "k": pa.array(range(len(rows)), pa.int32()),
    })
    path = str(tmp_path_factory.mktemp("rd") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()
    assert LF.read_native_file(path, columns=["ls"]).to_pylist() == \
        tbl.select(["ls"]).to_pylist()


def test_miniblock_list_repdef_edge_shapes(tmp_path):
    """Repdef edge shapes: a single row longer than one chunk (rows span
    chunks), float lists under zlib (bss composes inside the repdef
    page), paging, and the mixed-page refusal staying impossible from
    our writer (each page is self-contained)."""
    rows = [list(range(700)), [1], None, [], [2, None]] * 3
    fl = ([[0.5] * 300, None, [], [1.25, 2.5]] * 3 + [[9.0]] * 3)
    tbl = pa.table({"li": pa.array(rows, pa.list_(pa.int64())),
                    "lf": pa.array(fl, pa.list_(pa.float64()))})
    p = str(tmp_path / "edge.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock",
                         compression="zlib")
    assert LF.read_native_file(p).to_pylist() == tbl.to_pylist()
    p2 = str(tmp_path / "edge2.lance")
    LF.write_native_file(tbl, p2, page_rows=4, structural="2.1-miniblock")
    assert LF.read_native_file(p2).to_pylist() == tbl.to_pylist()


def test_miniblock_list_long_values_adapt_chunks(tmp_path):
    """List chunks adapt their slot counts under the 4KiB budget (the
    u16 chunk word holds size-in-words in 12 bits, so fixed 256-slot
    chunks would overflow on long strings); a single item beyond the
    ~32KiB ceiling routes to the FULL-ZIP repdef twin (round 12 — was a
    refusal) and still round-trips."""
    rows = [["y" * 700 for _ in range(8)], None, [], ["z" * 2000]] * 40
    tbl = pa.table({"ls": pa.array(rows, pa.list_(pa.string()))})
    p = str(tmp_path / "long.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock")
    assert LF.read_native_file(p).column("ls").to_pylist() == rows
    LF.write_native_file(tbl, p, structural="2.1-miniblock",
                         compression="zlib")
    assert LF.read_native_file(p).column("ls").to_pylist() == rows
    big_rows = [["x" * 40_000, None, "s"], None, [], ["y" * 100_000]]
    big = pa.table({"ls": pa.array(big_rows, pa.list_(pa.string()))})
    for comp in ("none", "zlib", "fsst"):
        pb = str(tmp_path / f"big-{comp}.lance")
        LF.write_native_file(big, pb, structural="2.1-miniblock",
                             compression=comp)
        assert LF.read_native_file(pb).column("ls").to_pylist() == big_rows
    # the full-zip twin composes with BOTH multi-layer stacks
    ll_rows = [[["a" * 50_000], None], None, [[]], [["b", None]]]
    t2 = pa.table({"ll": pa.array(ll_rows, pa.list_(pa.list_(pa.string())))})
    p2 = str(tmp_path / "ll-big.lance")
    LF.write_native_file(t2, p2, structural="2.1-miniblock")
    assert LF.read_native_file(p2).to_pylist() == t2.to_pylist()
    ls_rows = [[{"a": 1, "b": "c" * 60_000}, None], None, []]
    t3 = pa.table({"ls": pa.array(
        ls_rows, pa.list_(pa.struct([("a", pa.int64()),
                                     ("b", pa.string())])))})
    p3 = str(tmp_path / "ls-big.lance")
    LF.write_native_file(t3, p3, structural="2.1-miniblock",
                         compression="zlib")
    assert LF.read_native_file(p3).to_pylist() == t3.to_pylist()


def test_fullzip_zlib_roundtrip_and_shrink(tmp_path):
    """Large text values (the full-zip path) zlib-compress as one block
    per page buffer under write.native-compression=zlib — nulls, paging,
    and byte lengths all survive; repetitive large docs shrink
    dramatically."""
    vals = [("paragraph " * 900) + str(i) if i % 3 else None
            for i in range(200)]
    tbl = pa.table({"big": pa.array(vals, pa.string()),
                    "i": pa.array(range(200), pa.int64())})
    raw = str(tmp_path / "raw.lance")
    zl = str(tmp_path / "z.lance")
    LF.write_native_file(tbl, raw, structural="2.1-miniblock")
    LF.write_native_file(tbl, zl, structural="2.1-miniblock",
                         compression="zlib")
    import os

    assert os.path.getsize(zl) < os.path.getsize(raw) / 10
    assert LF.read_native_file(zl).to_pylist() == tbl.to_pylist()
    zp = str(tmp_path / "zp.lance")
    LF.write_native_file(tbl, zp, page_rows=64, structural="2.1-miniblock",
                         compression="zlib")
    assert LF.read_native_file(zp).to_pylist() == tbl.to_pylist()


# --- adversarial corruption net ----------------------------------------------
#
# The decoder's "never a silent misread" contract is enforced by named
# refusals for unknown encodings; this net attacks KNOWN encodings with
# flipped/truncated bytes. Honest scope: the format carries no
# checksums (neither does lance's), so a bit flip inside a value
# payload CAN change a value undetectably — what the net pins is that
# corruption of the page bytes never hangs, never crashes the process,
# and never changes the result's SHAPE silently: every outcome is
# either a loud Python exception or a table with the original schema
# and row count. Truncation (the partial-download failure mode) must
# always raise.

def _corruption_subject(tmp_path, mode: str) -> tuple[bytes, int]:
    """One file exercising every codec arm under ``mode`` (a 2.1
    compression, or '2.0' for the fixture-pinned layout: flat/validity/
    variable-offset/list-offset/struct pages); returns (file bytes, end
    of the page-data region — corruption stays inside the pages, as the
    net targets page bytes, not the self-describing schema)."""
    n = 60
    tbl = pa.table({
        "i": pa.array([None if v % 7 == 0 else v - 30 for v in range(n)],
                      pa.int64()),
        "runs": pa.array([v // 10 for v in range(n)], pa.int64()),
        "f": pa.array([float(v % 8) / 4 for v in range(n)], pa.float64()),
        "s": pa.array([None if v % 9 == 0 else f"value-{v}-{'x' * (v % 11)}"
                       for v in range(n)], pa.string()),
        "lang": pa.array(["en", "fr", "de"][0:1] * n, pa.string()),
        "flag": pa.array([v % 3 == 0 for v in range(n)], pa.bool_()),
        "li": pa.array([None if v % 5 == 0 else
                        ([] if v % 5 == 1 else [v, None, v + 1])
                        for v in range(n)], pa.list_(pa.int64())),
        "ll": pa.array([None if v % 6 == 0 else [[v], None, []]
                        for v in range(n)],
                       pa.list_(pa.list_(pa.int64()))),
        "ls": pa.array([None if v % 4 == 0 else
                        [{"a": v, "b": f"s{v}"}, None]
                        for v in range(n)],
                       pa.list_(pa.struct([("a", pa.int64()),
                                           ("b", pa.string())]))),
        "big": pa.array([("paragraph " * 500) + str(v) if v % 10 == 0
                         else "short" for v in range(n)], pa.string()),
        # giant list items -> the full-zip repdef twin (round 12)
        "lsbig": pa.array([None if v % 9 == 0 else
                           ["w" * 40_000 if v % 10 == 0 else "s", None]
                           for v in range(n)], pa.list_(pa.string())),
    })
    p = str(tmp_path / f"subject-{mode}.lance")
    if mode == "2.0":
        LF.write_native_file(tbl, p)
    else:
        LF.write_native_file(tbl, p, structural="2.1-miniblock",
                             compression=mode)
    blob = open(p, "rb").read()
    (_cms, _cmos, glob_off, _ng, _nc, _ma, _mi) = __import__("struct").unpack_from(
        "<QQQIIHH", blob, len(blob) - LF.FOOTER_LEN)
    desc_pos = __import__("struct").unpack_from("<Q", blob, glob_off)[0]
    return blob, int(desc_pos)


_SUBJECT_CACHE: dict = {}


def _get_subject(tmp_path_factory, mode):
    if mode not in _SUBJECT_CACHE:
        base = tmp_path_factory.mktemp(f"corrupt-{mode}")
        blob, data_end = _corruption_subject(base, mode)
        good = LF.read_native_file(str(base / f"subject-{mode}.lance"))
        _SUBJECT_CACHE[mode] = (blob, data_end, good.schema,
                                good.num_rows, str(base))
    return _SUBJECT_CACHE[mode]


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(["none", "zlib", "fsst", "2.0"]), st.data())
def test_codec_bitflip_corruption_is_bounded(tmp_path_factory, compression,
                                             data):
    """Flip one page byte (any arm, any stream): decode either raises a
    loud exception or returns a table with the ORIGINAL schema and row
    count — corruption never hangs, never segfaults, never silently
    reshapes the result. (A value-silent flip is undetectable from the
    FILE alone — the format carries no page checksums — but at the
    DATASET level round 13 closed it: every fragment producer stamps a
    write-time sha256 into FragmentInfo.stats and
    maintenance.verify_integrity makes EVERY bit-flip on engine-written
    data loud; see test_maintenance.py::
    test_bit_flip_on_engine_written_data_is_loud.)"""
    blob, data_end, schema, nrows, base = _get_subject(tmp_path_factory,
                                                       compression)
    if data_end == 0:
        return
    pos = data.draw(st.integers(min_value=0, max_value=data_end - 1))
    mask = data.draw(st.integers(min_value=1, max_value=255))
    mutated = bytearray(blob)
    mutated[pos] ^= mask
    p = os.path.join(base, "mutated.lance")
    with open(p, "wb") as fh:
        fh.write(bytes(mutated))
    try:
        got = LF.read_native_file(p)
    except Exception:
        return  # loud — the accepted outcome
    assert got.schema == schema
    assert got.num_rows == nrows


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(["none", "zlib", "fsst", "2.0"]), st.data())
def test_codec_truncation_always_raises(tmp_path_factory, compression, data):
    """A truncated file (the partial-download / interrupted-PUT failure
    mode) must ALWAYS raise — the footer, offset tables, or buffer
    fetches land past EOF; no prefix of a file is a valid file."""
    blob, _data_end, _schema, _nrows, base = _get_subject(tmp_path_factory,
                                                          compression)
    cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    p = os.path.join(base, "truncated.lance")
    with open(p, "wb") as fh:
        fh.write(blob[:cut])
    with pytest.raises(Exception):
        LF.read_native_file(p)


# --- multi-layer repdef: list<list<T>> and list<struct<leafs>> ---------------

nested_list_rows = st.lists(
    st.one_of(st.none(), st.lists(
        st.one_of(st.none(), st.lists(
            st.one_of(st.none(), st.integers(min_value=-2**40,
                                             max_value=2**40)),
            max_size=6)),
        max_size=5)),
    max_size=120)


@settings(max_examples=60, deadline=None)
@given(nested_list_rows)
def test_miniblock_list_of_list_roundtrip(tmp_path_factory, rows):
    """Two repdef list layers in one structural page: repetition 2 opens
    a row, 1 an inner list, 0 continues; definition codes cut null/empty
    subtrees at either layer with one placeholder slot. int64 and string
    leaves, all null/empty shapes, rows spanning chunks — exact
    round-trip, projection intact."""
    srows = [None if r is None else
             [None if inner is None else
              [None if x is None else f"v{x % 17}" for x in inner]
              for inner in r] for r in rows]
    tbl = pa.table({
        "ll": pa.array(rows, pa.list_(pa.list_(pa.int64()))),
        "lls": pa.array(srows, pa.list_(pa.list_(pa.string()))),
        "k": pa.array(range(len(rows)), pa.int32()),
    })
    path = str(tmp_path_factory.mktemp("ll") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()
    assert LF.read_native_file(path, columns=["ll"]).to_pylist() == \
        tbl.select(["ll"]).to_pylist()


struct_item = st.one_of(
    st.none(),  # null struct (distinct from null members)
    st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(min_value=-2**40,
                                              max_value=2**40)),
        "b": texts,
        "t": opt_ts,
        "f": opt_bool,
    }))
list_struct_rows = st.lists(
    st.one_of(st.none(), st.lists(struct_item, max_size=6)),
    max_size=120)


@settings(max_examples=60, deadline=None)
@given(list_struct_rows)
def test_miniblock_list_of_struct_roundtrip(tmp_path_factory, rows):
    """list<struct<int64,string,timestamp,bool>> shreds per member: each
    member page carries the full [list, struct, item] repdef path (null
    struct = def 2, null member = def 1) and decodes independently —
    temporal members via their epoch-integer storage streams, bool via
    packed bits; the assembler zips members back, refusing inconsistent
    shapes. Null lists, empty lists, null structs, null members,
    unicode — exact round-trip in every compression mode."""
    typ = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string()),
                              ("t", pa.timestamp("us")),
                              ("f", pa.bool_())]))
    tbl = pa.table({"ls": pa.array(rows, typ),
                    "k": pa.array(range(len(rows)), pa.int64())})
    base = tmp_path_factory.mktemp("ls")
    for comp in ("none", "fsst"):
        path = str(base / f"t-{comp}.lance")
        LF.write_native_file(tbl, path, structural="2.1-miniblock",
                             compression=comp)
        got = LF.read_native_file(path)
        assert got.schema == tbl.schema
        assert got.to_pylist() == tbl.to_pylist()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(
    st.one_of(st.none(), st.tuples(opt_ts, st.one_of(st.none(), days),
                                   opt_bool)),
    max_size=5)), max_size=80))
def test_miniblock_repdef_temporal_bool_leaves(tmp_path_factory, rows):
    """Repdef leaves beyond the numeric/string set (round 12): timestamp
    and date32 leaves cast to their epoch-integer storage streams (the
    schema maps them back — pyarrow accepts epoch ints for temporal
    items), bool leaves ride LSB-first packed-bit streams; single- and
    double-layer stacks, zlib composition, and paging all round-trip."""
    lt_rows = [None if r is None else
               [None if x is None else x[0] for x in r] for r in rows]
    ld_rows = [None if r is None else
               [None if x is None else x[1] for x in r] for r in rows]
    lb_rows = [None if r is None else
               [None if x is None else x[2] for x in r] for r in rows]
    ll_rows = [None if r is None else [lt_rows[i], None]
               for i, r in enumerate(rows)]
    tbl = pa.table({
        "lt": pa.array(lt_rows, pa.list_(pa.timestamp("us"))),
        "ld": pa.array(ld_rows, pa.list_(pa.date32())),
        "lb": pa.array(lb_rows, pa.list_(pa.bool_())),
        "llt": pa.array(ll_rows, pa.list_(pa.list_(pa.timestamp("us")))),
    })
    base = tmp_path_factory.mktemp("tb")
    for comp in ("none", "zlib"):
        p = str(base / f"t-{comp}.lance")
        LF.write_native_file(tbl, p, structural="2.1-miniblock",
                             compression=comp)
        got = LF.read_native_file(p)
        assert got.schema == tbl.schema
        assert got.to_pylist() == tbl.to_pylist()


def test_miniblock_multilayer_edge_shapes(tmp_path):
    """Edge shapes for the multi-layer stacks: paging, zlib over the
    leaf stream, a row whose inner list spans chunks, and — since the
    round-13 recursive assembler — depth-3 lists riding a structural
    page too (the round-12 per-shape refusal is gone)."""
    rows = [[list(range(700))], None, [], [None], [[], [1, None]]] * 3
    tbl = pa.table({"ll": pa.array(rows, pa.list_(pa.list_(pa.int64())))})
    p = str(tmp_path / "edge.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock",
                         compression="zlib")
    assert LF.read_native_file(p).to_pylist() == tbl.to_pylist()
    p2 = str(tmp_path / "paged.lance")
    LF.write_native_file(tbl, p2, page_rows=4, structural="2.1-miniblock")
    assert LF.read_native_file(p2).to_pylist() == tbl.to_pylist()
    t3 = pa.table({"lll": pa.array([[[[1]]], None, [[[2], None], []]],
                                   pa.list_(pa.list_(pa.list_(pa.int64()))))})
    p3 = str(tmp_path / "deep.lance")
    LF.write_native_file(t3, p3, structural="2.1-miniblock")
    assert LF.read_native_file(p3).to_pylist() == t3.to_pylist()


# --- round 13: one recursive Dremel shredder/assembler for ANY stack ---------

def test_repdef_def_code_allocation_is_pinned():
    """The definition-code allocation is part of the on-disk format:
    files written by rounds 11-12 (hand-rolled per-shape planners) must
    keep decoding under the recursive generalization. Pin the generic
    allocator to the documented constants for every legacy stack."""
    codes = LF._repdef_def_codes(("list",))
    assert codes == {(0, "empty"): 2, (0, "null"): 3}
    codes = LF._repdef_def_codes(("list", "list"))
    assert codes == {(1, "empty"): 2, (1, "null"): 3,
                     (0, "empty"): 4, (0, "null"): 5}
    codes = LF._repdef_def_codes(("list", "struct"))
    assert codes == {(1, "null"): 2, (0, "empty"): 3, (0, "null"): 4}
    # and the new deep stacks allocate innermost-first past them
    codes = LF._repdef_def_codes(("list", "struct", "list"))
    assert codes == {(2, "empty"): 2, (2, "null"): 3, (1, "null"): 4,
                     (0, "empty"): 5, (0, "null"): 6}


deep3_rows = st.lists(
    st.one_of(st.none(), st.lists(
        st.one_of(st.none(), st.lists(
            st.one_of(st.none(), st.lists(
                st.one_of(st.none(), st.integers(min_value=-2**40,
                                                 max_value=2**40)),
                max_size=4)),
            max_size=4)),
        max_size=3)),
    max_size=60)


@settings(max_examples=40, deadline=None)
@given(deep3_rows)
def test_miniblock_repdef_depth3_lists(tmp_path_factory, rows):
    """list<list<list<T>>> — THREE repdef list layers in one structural
    page (rep 3 opens a row, 2/1 inner lists, 0 continues; def codes cut
    null/empty subtrees at any of the three layers). int64 and string
    leaves, plain and zlib — exact round-trip, projection intact."""
    srows = [None if r is None else
             [None if m is None else
              [None if inner is None else
               [None if x is None else f"s{x % 23}" for x in inner]
               for inner in m] for m in r] for r in rows]
    tbl = pa.table({
        "d3": pa.array(rows, pa.list_(pa.list_(pa.list_(pa.int64())))),
        "d3s": pa.array(srows, pa.list_(pa.list_(pa.list_(pa.string())))),
        "k": pa.array(range(len(rows)), pa.int32()),
    })
    base = tmp_path_factory.mktemp("d3")
    for comp in ("none", "zlib"):
        path = str(base / f"t-{comp}.lance")
        LF.write_native_file(tbl, path, structural="2.1-miniblock",
                             compression=comp)
        got = LF.read_native_file(path)
        assert got.schema == tbl.schema
        assert got.to_pylist() == tbl.to_pylist()
    assert LF.read_native_file(path, columns=["d3"]).to_pylist() == \
        tbl.select(["d3"]).to_pylist()


struct_list_member = st.one_of(
    st.none(),
    st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(min_value=-2**40,
                                              max_value=2**40)),
        "b": st.one_of(st.none(), st.lists(texts, max_size=4)),
        "t": opt_ts,
    }))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(struct_list_member, max_size=4)),
                max_size=60))
def test_miniblock_repdef_struct_with_list_member(tmp_path_factory, rows):
    """list<struct<a, list<b>, t>> — a LIST member inside the shredded
    struct, so member b's page carries the [list, struct, list, item]
    stack (rep 2 opens a row, 1 a new outer element, 0 continues b's
    inner list; def 4 = null struct between the two list layers' codes).
    Null structs, null member lists, temporal members — exact round-trip
    plain and FSST."""
    typ = pa.list_(pa.struct([("a", pa.int64()),
                              ("b", pa.list_(pa.string())),
                              ("t", pa.timestamp("us"))]))
    tbl = pa.table({"ls": pa.array(rows, typ),
                    "k": pa.array(range(len(rows)), pa.int64())})
    base = tmp_path_factory.mktemp("slm")
    for comp in ("none", "fsst"):
        path = str(base / f"t-{comp}.lance")
        LF.write_native_file(tbl, path, structural="2.1-miniblock",
                             compression=comp)
        got = LF.read_native_file(path)
        assert got.schema == tbl.schema
        assert got.to_pylist() == tbl.to_pylist()


nested_struct_member = st.one_of(
    st.none(),
    st.fixed_dictionaries({
        "s": st.one_of(st.none(), st.fixed_dictionaries({
            "x": st.one_of(st.none(), st.integers(min_value=-2**40,
                                                  max_value=2**40)),
            "y": texts,
        })),
        "t": st.one_of(st.none(), st.floats(allow_nan=False,
                                            allow_infinity=False,
                                            width=64)),
    }))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(nested_struct_member, max_size=4)),
                max_size=60))
def test_miniblock_repdef_nested_struct_member(tmp_path_factory, rows):
    """list<struct<struct<x,y>, t>> — TWO struct layers in one stack, so
    x/y's pages carry [list, struct, struct, item] and the null-struct
    markers are depth-tagged: the zip must tell 'outer struct null'
    (whole element None) from 'inner struct null' (element's s member
    None) from 'inner members null'. Exact round-trip."""
    typ = pa.list_(pa.struct([
        ("s", pa.struct([("x", pa.int64()), ("y", pa.string())])),
        ("t", pa.float64())]))
    tbl = pa.table({"ns": pa.array(rows, typ),
                    "k": pa.array(range(len(rows)), pa.int64())})
    path = str(tmp_path_factory.mktemp("nsm") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_repdef_shred_assemble_inverse_random_stacks(data):
    """The shredder and assembler are exact inverses for RANDOM container
    stacks up to depth 5 (property, no file IO): generate a stack of
    list/struct layers, build random values of that shape, shred, then
    assemble and compare. Covers stacks no fixture pins (e.g.
    list<struct<list<list>>>), which is the point of the recursion."""
    kinds = data.draw(st.lists(st.sampled_from(["list", "struct"]),
                               min_size=1, max_size=5)
                      .filter(lambda ks: "list" in ks))
    # a struct layer at position i descends member "m{i}"
    stack = tuple(("list",) if k == "list" else ("struct", f"m{i}")
                  for i, k in enumerate(kinds))

    def value_strategy(li):
        if li == len(kinds):
            return st.one_of(st.none(),
                             st.integers(min_value=-1000, max_value=1000))
        if kinds[li] == "struct":
            # null struct, or a dict holding the one member we descend
            # (extra members don't exist in a shredded leaf's view)
            return st.one_of(st.none(), st.fixed_dictionaries(
                {f"m{li}": value_strategy(li + 1)}))
        return st.one_of(st.none(),
                         st.lists(value_strategy(li + 1), max_size=3))

    rows = data.draw(st.lists(value_strategy(0), max_size=30))
    slots = LF._shred_repdef(rows, stack, 0)
    reps = [r for r, _, _ in slots]
    defs = [d for _, d, _ in slots]
    vals = [v for _, _, v in slots]
    got = LF._assemble_repdef_rows(reps, defs, vals, tuple(kinds), "prop")

    def project(v, li):
        """rows as the assembler reproduces them: struct layers become
        transparent (the member value or a depth marker)."""
        if li == len(kinds):
            return v
        if kinds[li] == "struct":
            if v is None:
                depth = sum(1 for k in kinds[:li] if k == "struct")
                return ("NULL_STRUCT", depth)
            return project(v[f"m{li}"], li + 1)
        if v is None or v == []:
            return v
        return [project(x, li + 1) for x in v]

    def norm(v):
        if isinstance(v, LF._NullStructMarker):
            return ("NULL_STRUCT", v.depth)
        if isinstance(v, list):
            return [norm(x) for x in v]
        return v

    assert [norm(r) for r in got] == [project(r, 0) for r in rows]


# --- FSST (sources/fsst.py + the codec's f7 arm) -----------------------------

def test_fsst_paper_semantics_vector():
    """Transcribed-from-paper semantics (Boncz/Neumann/Leis, PVLDB 2020):
    each output byte is a symbol code substituted from the static table,
    except the escape byte 255 which passes the next byte through. Greedy
    longest-match encoding of 'tumcwitumvldb' over {tum,cwi,vldb} yields
    exactly the 4-code stream; an uncovered byte escapes as [255, byte]."""
    from flink_connector_lance_spark.sources import fsst

    table = [b"tum", b"cwi", b"vldb"]
    assert fsst.compress(b"tumcwitumvldb", table) == bytes([0, 1, 0, 2])
    assert fsst.decompress(bytes([0, 1, 0, 2]), table) == b"tumcwitumvldb"
    assert fsst.compress(b"tumX", table) == bytes([0, 0xFF, ord("X")])
    assert fsst.decompress(bytes([0, 0xFF, ord("X")]), table) == b"tumX"
    # table blob framing round-trips
    assert fsst.deserialize_table(fsst.serialize_table(table)) == table


def test_fsst_corruption_is_loud():
    """Corrupt FSST inputs raise named ValueErrors, never wrong bytes:
    out-of-table codes, a truncated escape, and malformed table blobs."""
    from flink_connector_lance_spark.sources import fsst

    table = [b"ab", b"c"]
    with pytest.raises(ValueError, match="beyond the 2-symbol table"):
        fsst.decompress(bytes([5]), table)
    with pytest.raises(ValueError, match="escape byte at end"):
        fsst.decompress(bytes([0xFF]), table)
    with pytest.raises(ValueError, match="empty"):
        fsst.deserialize_table(b"")
    with pytest.raises(ValueError, match="truncated"):
        fsst.deserialize_table(bytes([3, 1]))
    with pytest.raises(ValueError, match="size mismatch"):
        fsst.deserialize_table(bytes([1, 2]) + b"x")
    with pytest.raises(ValueError, match="outside 1..8"):
        fsst.deserialize_table(bytes([1, 9]) + b"123456789")


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(texts, blobs), max_size=300))
def test_miniblock_fsst_roundtrip(tmp_path_factory, pairs):
    """write.native-compression=fsst: string/binary mini-block and
    full-zip pages store per-string FSST substitution streams against a
    per-page symbol table (compressed lengths in the u32 stream — random
    access survives); list<string> leaf streams compose the same arm.
    Unicode, empties, nulls, and arbitrary bytes round-trip exactly."""
    svals = [s for s, _ in pairs]
    bvals = [b for _, b in pairs]
    rows = [None if s is None else [s, None, s[:5]] for s in svals]
    tbl = pa.table({
        "s": pa.array(svals, pa.string()),
        "b": pa.array(bvals, pa.binary()),
        "ls": pa.array(rows, pa.list_(pa.string())),
        "i": pa.array(range(len(svals)), pa.int64()),
    })
    path = str(tmp_path_factory.mktemp("fsst") / "t.lance")
    LF.write_native_file(tbl, path, structural="2.1-miniblock",
                         compression="fsst")
    got = LF.read_native_file(path)
    assert got.schema == tbl.schema
    assert got.to_pylist() == tbl.to_pylist()
    # column pruning still skips the other columns' buffers
    assert LF.read_native_file(path, columns=["s"]).to_pylist() == \
        tbl.select(["s"]).to_pylist()


def test_fsst_expansion_stays_inside_chunk_words(tmp_path):
    """FSST can EXPAND incompressible bytes (escapes double uncovered
    bytes): raw values at the 4000-byte full-zip threshold can become
    ~8KB substitution streams, overflowing the 4KiB chunk budget down
    to 1-value chunks — which must still fit the u16 chunk word's
    12-bit size-in-words field (≤32760B). Pinned with deterministic
    incompressible values in both layouts."""
    import random

    rnd = random.Random(7)
    vals = [bytes(rnd.randrange(256) for _ in range(3999))
            for _ in range(6)] + [None, b""]
    t = pa.table({"b": pa.array(vals, pa.binary())})
    p = str(tmp_path / "near.lance")
    LF.write_native_file(t, p, structural="2.1-miniblock",
                         compression="fsst")
    assert LF.read_native_file(p).to_pylist() == t.to_pylist()
    # past the threshold: full-zip with expansion, plus a compressible
    # neighbor sharing the page's symbol table
    vals2 = [bytes(rnd.randrange(256) for _ in range(9000)), None,
             b"compressible " * 400]
    t2 = pa.table({"b": pa.array(vals2, pa.binary())})
    p2 = str(tmp_path / "fz.lance")
    LF.write_native_file(t2, p2, structural="2.1-miniblock",
                         compression="fsst")
    assert LF.read_native_file(p2).to_pylist() == t2.to_pylist()


def test_fsst_and_shredded_pages_nonvacuous(tmp_path):
    """The hash-gated stages could pass vacuously if the writer silently
    fell back to plain variable pages — pin the WIRE: under
    write.native-compression=fsst a high-cardinality string column's
    page really carries the CompressiveEncoding f7 Fsst arm, and a
    list<struct> member page really carries the [list, struct, item]
    repdef layer codes."""
    tbl = pa.table({
        "uri": pa.array([f"https://example.com/items/{i}"
                         for i in range(300)], pa.string()),
        "ls": pa.array([[{"a": i, "b": f"x{i}"}, None] for i in range(300)],
                       pa.list_(pa.struct([("a", pa.int64()),
                                           ("b", pa.string())]))),
    })
    p = str(tmp_path / "nv.lance")
    LF.write_native_file(tbl, p, structural="2.1-miniblock",
                         compression="fsst")
    blob = open(p, "rb").read()
    (_cms, cmos, _gbos, _ng, num_cols, _ma, _mi) = LF._read_footer(blob)
    fsst_pages = 0
    struct_layer_pages = 0
    for col in range(num_cols):
        for pg in LF._column_pages(blob, col, cmos):
            if not pg.enc_url.endswith(b"PageLayout") or 1 not in pg.encoding:
                continue
            mb = LF._pb_fields(LF._one(pg.encoding, 1, b""))
            comp = LF._pb_fields(LF._one(mb, 3, b""))
            if 7 in comp:
                fsst_pages += 1
            layers = LF._repdef_layers(mb)
            if any(l in (5, 6) for l in layers):  # struct layer codes
                struct_layer_pages += 1
    assert fsst_pages >= 2, "no page carries the Fsst (f7) arm"
    assert struct_layer_pages == 2, \
        "expected exactly the two shredded member pages to carry a struct layer"
    assert LF.read_native_file(p).to_pylist() == tbl.to_pylist()


def test_fsst_shrinks_storage(tmp_path):
    """The point of FSST: high-cardinality repetitive text (dictionary
    doesn't apply) shrinks several-fold in BOTH layouts — mini-block
    (short values) and full-zip (values past the 4KB threshold) — while
    each string stays independently decodable."""
    import os

    n = 20_000
    small = pa.table({"s": pa.array(
        [f"https://example.com/products/category-{v % 97}/item?id={v}"
         for v in range(n)], pa.string())})
    raw = str(tmp_path / "raw.lance")
    fz = str(tmp_path / "f.lance")
    LF.write_native_file(small, raw, structural="2.1-miniblock")
    LF.write_native_file(small, fz, structural="2.1-miniblock",
                         compression="fsst")
    assert os.path.getsize(fz) < os.path.getsize(raw) / 2
    assert LF.read_native_file(fz).to_pylist() == small.to_pylist()

    big = pa.table({"doc": pa.array(
        [None if i % 7 == 0 else ("the common crawl paragraph " * 200)
         + str(i) for i in range(120)], pa.string())})
    braw = str(tmp_path / "braw.lance")
    bf = str(tmp_path / "bf.lance")
    LF.write_native_file(big, braw, structural="2.1-miniblock")
    LF.write_native_file(big, bf, structural="2.1-miniblock",
                         compression="fsst")
    assert os.path.getsize(bf) < os.path.getsize(braw) / 3
    assert LF.read_native_file(bf).to_pylist() == big.to_pylist()
    # paging composes
    bp = str(tmp_path / "bp.lance")
    LF.write_native_file(big, bp, page_rows=32, structural="2.1-miniblock",
                         compression="fsst")
    assert LF.read_native_file(bp).to_pylist() == big.to_pylist()


# --- decimal128 scaffold (SELF-CONSISTENT; SURVEY §7.0.5) ---------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.decimals(allow_nan=False, allow_infinity=False,
                            places=4,
                            min_value=-10**25, max_value=10**25),
                max_size=50),
       st.integers(min_value=0, max_value=10))
def test_decimal128_scaffold_roundtrips_self_consistent(values, scale):
    """The 16-byte two's-complement fixed-width codec round-trips ANY
    decimal that fits 128 bits at the chosen scale — against ITSELF
    only (the lance logical-type string stays unpinnable; the writer
    keeps its named refusal — test_refusals in test_lance_native_write).
    Also matches Arrow's own decimal128 buffer bytes, the public layout
    lance's fixed-width page would carry."""
    import decimal

    import pyarrow as pa

    # quantize inputs to the scale under test (the scaffold encodes the
    # UNSCALED integer at `scale`; finer digits would truncate) — wide
    # context: 128-bit unscaled values reach 39 digits
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        q = decimal.Decimal(1).scaleb(-scale)
        values = [v.quantize(q) for v in values]
    blob = LF.encode_decimal128_flat(values, scale)
    got = LF.decode_decimal128_flat(blob, len(values), scale)
    assert got == values
    # cross-check against Arrow's decimal128 little-endian buffer
    if values:
        arr = pa.array(values, pa.decimal128(38, scale))
        assert arr.buffers()[1].to_pybytes()[:16 * len(values)] == blob
    # loud on truncation
    if values:
        import pytest

        with pytest.raises(ValueError, match="decimal128 stream"):
            LF.decode_decimal128_flat(blob[:-1], len(values), scale)


def test_fullzip_twin_on_deep_stacks(tmp_path):
    """A single value past the mini-block chunk ceiling routes the WHOLE
    page to the full-zip twin — for the round-13 recursive stacks too:
    giant strings inside list<struct<t, ws:list<string>>> (the
    [list,struct,list,item] stack) and inside list<list<list<string>>>.
    Round-trip + the final-slot cursor pin (the buffer must be consumed
    exactly)."""
    big = "x" * 40_000
    ds_rows = [
        [{"t": big, "ws": [big + "a", None]}, None,
         {"t": None, "ws": []}],
        None, [],
        [{"t": "small", "ws": None}],
    ]
    d3_rows = [[[[big, None], []], None], None, [], [[[big + "z"]]]]
    typ = pa.list_(pa.struct([("t", pa.string()),
                              ("ws", pa.list_(pa.string()))]))
    tbl = pa.table({
        "ds": pa.array(ds_rows, typ),
        "d3": pa.array(d3_rows, pa.list_(pa.list_(pa.list_(pa.string())))),
    })
    for comp in ("none", "zlib", "fsst"):
        p = str(tmp_path / f"deep-{comp}.lance")
        LF.write_native_file(tbl, p, structural="2.1-miniblock",
                             compression=comp)
        got = LF.read_native_file(p)
        assert got.schema == tbl.schema
        assert got.to_pylist() == tbl.to_pylist()
