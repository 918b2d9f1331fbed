"""Property-based check of the filter compiler: for ANY generated
predicate tree, the compiled filter string — evaluated by Spark SQL and
by DuckDB — selects exactly the rows the semantic evaluation of the tree
selects. This pins operator mirroring, parenthesization (including the
compose() top-level-OR rebinding case the round-1 review caught), literal
escaping, and NULL three-valued logic in one sweep."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import flink_connector_lance_spark.plans.filters as PF

COLS = {"a": "int", "b": "int", "s": "str"}
ROWS = [
    (0, 0, "x"), (1, 5, "y"), (2, 10, "a'b"), (3, None, "%"),
    (None, 7, None), (5, 5, "yy"), (7, 2, ""),
]


def _leaf():
    int_cmp = st.tuples(
        st.sampled_from(sorted(PF._COMPARISONS)),
        st.sampled_from(["a", "b"]),
        st.integers(-2, 12),
        st.booleans(),  # literal on the left -> mirroring path
    ).map(lambda t: PF.Cmp(t[0], PF.Lit(t[2]), PF.Col(t[1])) if t[3]
          else PF.Cmp(t[0], PF.Col(t[1]), PF.Lit(t[2])))
    str_cmp = st.tuples(
        st.sampled_from(["=", "<>"]),
        st.sampled_from(["x", "y", "a'b", "", "%"]),
    ).map(lambda t: PF.Cmp(t[0], PF.Col("s"), PF.Lit(t[1])))
    null_chk = st.tuples(st.sampled_from(["a", "b", "s"]), st.booleans()).map(
        lambda t: PF.IsNull(PF.Col(t[0]), negated=t[1]))
    like = st.sampled_from(["y%", "%b", "x", "%'%"]).map(
        lambda p: PF.Like(PF.Col("s"), p))
    return st.one_of(int_cmp, str_cmp, null_chk, like)


def _tree(depth: int = 3):
    return st.recursive(
        _leaf(),
        lambda children: st.one_of(
            st.tuples(children, children).map(lambda t: PF.And(*t)),
            st.tuples(children, children).map(lambda t: PF.Or(*t)),
            children.map(PF.Not),
        ),
        max_leaves=6,
    )


def _eval(node, row: dict):
    """Three-valued-logic reference evaluation of the predicate tree."""
    if isinstance(node, PF.Cmp):
        lv = row[node.left.name] if isinstance(node.left, PF.Col) else node.left.value
        rv = row[node.right.name] if isinstance(node.right, PF.Col) else node.right.value
        if lv is None or rv is None:
            return None
        return {"=": lv == rv, "<>": lv != rv, ">": lv > rv,
                ">=": lv >= rv, "<": lv < rv, "<=": lv <= rv}[node.op]
    if isinstance(node, PF.And):
        l, r = _eval(node.left, row), _eval(node.right, row)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if isinstance(node, PF.Or):
        l, r = _eval(node.left, row), _eval(node.right, row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    if isinstance(node, PF.Not):
        v = _eval(node.child, row)
        return None if v is None else not v
    if isinstance(node, PF.IsNull):
        isnull = row[node.child.name] is None
        return (not isnull) if node.negated else isnull
    if isinstance(node, PF.Like):
        v = row[node.child.name]
        if v is None:
            return None
        import re
        pat = "^" + re.escape(node.pattern).replace("%", ".*").replace("_", ".") + "$"
        # re.escape escapes % and _ literally; undo for the wildcard forms
        pat = pat.replace(re.escape("%"), ".*").replace(re.escape("_"), ".")
        return re.match(pat, v) is not None
    raise AssertionError(type(node))


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_tree())
def test_compiled_filter_matches_semantics_in_spark_and_duckdb(tree, spark, duck):
    sql = PF.compile_filter(tree)
    if sql is None:
        return  # residual: nothing to cross-check
    expect = {
        i for i, (a, b, s) in enumerate(ROWS)
        if _eval(tree, {"a": a, "b": b, "s": s}) is True
    }

    sdf = spark.createDataFrame(
        [(i, a, b, s) for i, (a, b, s) in enumerate(ROWS)],
        "i int, a int, b int, s string",
    )
    got_spark = {r["i"] for r in sdf.filter(sql).select("i").collect()}
    assert got_spark == expect, f"spark mismatch for {sql!r}"

    duck.execute("CREATE OR REPLACE TABLE _pf AS SELECT * FROM (VALUES "
                 + ", ".join(
                     f"({i}, {'NULL' if a is None else a}, "
                     f"{'NULL' if b is None else b}, "
                     + ("NULL" if s is None else "'" + s.replace("'", "''") + "'") + ")"
                     for i, (a, b, s) in enumerate(ROWS))
                 + ") AS t(i, a, b, s)")
    got_duck = {r[0] for r in duck.execute(f"SELECT i FROM _pf WHERE {sql}").fetchall()}
    assert got_duck == expect, f"duckdb mismatch for {sql!r}"


def test_compose_parenthesizes_top_level_or(spark):
    # the exact rebinding case: (a) OR (b) joined with (c) must stay
    # ((a) OR (b)) AND (c)
    or_part = PF.compile_filter(
        PF.Or(PF.Cmp("=", PF.Col("a"), PF.Lit(1)), PF.Cmp("=", PF.Col("a"), PF.Lit(7))))
    composed = PF.compose([or_part], configured="b = 2")
    sdf = spark.createDataFrame([(1, 5), (7, 2), (1, 2)], "a int, b int")
    got = {(r["a"], r["b"]) for r in sdf.filter(composed).collect()}
    # a in (1,7) AND b=2. Under the rebinding bug — a=1 OR (a=7 AND b=2) —
    # row (1,5) would leak in.
    assert got == {(1, 2), (7, 2)}
