"""Predicate -> source filter-string compiler.

Parity with the reference's pushdown bridge, which converts planner
expression trees into Lance SQL filter strings with *partial acceptance*
(accepted predicates are removed from the engine plan, unconvertible ones
remain — ref table/LanceDynamicTableSource.java:177-345).

Accepted (ref :221-262): =, <>, >, >=, <, <= (with operator mirroring
when the literal is on the left, :273-303), AND/OR (parenthesized,
rejected wholesale if any child is unconvertible, :235-238, :308-318),
NOT (:239-246), IS [NOT] NULL (:248-258), LIKE (:260-262).
Rejected -> residual (ref :263-264): IN, BETWEEN (Catalyst re-applies
residuals automatically, so correctness never depends on acceptance).

Literal rendering (ref :323-345): strings quoted with '' escaping,
numbers verbatim, booleans upper-case, None -> NULL.

The predicate AST is a tiny dataclass tree (this engine's analog of
Flink's ResolvedExpression for the source boundary); ``compile_filters``
returns (accepted_strings, residual_nodes) exactly like the reference's
``Result.of(accepted, remaining)`` (:192).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

_MIRROR = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "=": "=", "<>": "<>"}
_COMPARISONS = {"=", "<>", ">", ">=", "<", "<="}


@dataclass(frozen=True)
class Col:
    name: str


@dataclass(frozen=True)
class Lit:
    value: Any


@dataclass(frozen=True)
class Cmp:
    op: str  # =, <>, >, >=, <, <=
    left: Any
    right: Any


@dataclass(frozen=True)
class And:
    left: Any
    right: Any


@dataclass(frozen=True)
class Or:
    left: Any
    right: Any


@dataclass(frozen=True)
class Not:
    child: Any


@dataclass(frozen=True)
class IsNull:
    child: Any
    negated: bool = False


@dataclass(frozen=True)
class Like:
    child: Any
    pattern: str


@dataclass(frozen=True)
class In:  # deliberately unconvertible (ref :263-264)
    child: Any
    values: tuple


@dataclass(frozen=True)
class Between:  # deliberately unconvertible (ref :263-264)
    child: Any
    low: Any
    high: Any


def render_literal(v: Any) -> str:
    """ref table/LanceDynamicTableSource.java:323-345."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, _dt.date):
        return "'" + v.isoformat() + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    raise _Unconvertible(f"literal type {type(v).__name__}")


class _Unconvertible(Exception):
    pass


def _compile(node: Any) -> str:
    if isinstance(node, Cmp):
        if node.op not in _COMPARISONS:
            raise _Unconvertible(f"operator {node.op}")
        left, right, op = node.left, node.right, node.op
        # mirror when literal is on the left (ref :273-303)
        if isinstance(left, Lit) and isinstance(right, Col):
            left, right, op = right, left, _MIRROR[node.op]
        if isinstance(left, Col) and isinstance(right, Lit):
            return f"{left.name} {op} {render_literal(right.value)}"
        raise _Unconvertible("comparison requires column vs literal")
    if isinstance(node, And):
        return f"({_compile(node.left)}) AND ({_compile(node.right)})"
    if isinstance(node, Or):
        return f"({_compile(node.left)}) OR ({_compile(node.right)})"
    if isinstance(node, Not):
        return f"NOT ({_compile(node.child)})"
    if isinstance(node, IsNull):
        if not isinstance(node.child, Col):
            raise _Unconvertible("IS NULL requires a column")
        return f"{node.child.name} IS {'NOT ' if node.negated else ''}NULL"
    if isinstance(node, Like):
        if not isinstance(node.child, Col):
            raise _Unconvertible("LIKE requires a column")
        return f"{node.child.name} LIKE {render_literal(node.pattern)}"
    if isinstance(node, (In, Between)):
        raise _Unconvertible(type(node).__name__)  # ref :263-264
    raise _Unconvertible(f"node {type(node).__name__}")


def compile_filter(node: Any) -> str | None:
    """Compile one predicate; None = unconvertible (stays residual)."""
    try:
        return _compile(node)
    except _Unconvertible:
        return None


def compile_filters(nodes: list) -> tuple[list[str], list]:
    """Partial acceptance over a predicate list
    (ref Result.of(accepted, remaining), :192)."""
    accepted: list[str] = []
    residual: list = []
    for n in nodes:
        s = compile_filter(n)
        if s is None:
            residual.append(n)
        else:
            accepted.append(s)
    return accepted, residual


def compose(accepted: list[str], configured: str | None = None) -> str | None:
    """AND-join accepted filters with a pre-configured read.filter
    (ref table/LanceDynamicTableSource.java:350-363)."""
    parts = list(accepted)
    if configured:
        parts.append(configured)
    if not parts:
        return None
    # every part is wrapped unconditionally: a compiled top-level OR is
    # exactly "(a) OR (b)", which starts with "(" but is NOT fully
    # parenthesized — joining it unwrapped would rebind as a OR (b AND c)
    return " AND ".join(f"({p})" for p in parts)
