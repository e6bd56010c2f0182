"""SenSQL federation rewrite — the fork's delta, re-expressed in Python.

Mirrors ``presto-main/.../sensql/SenSQLModule.java`` (the only file the
fork adds; SURVEY.md §1.3):

- ``rewrite`` (:88)        — split WHERE into metadata vs measurement
  predicates, resolve matching node ids on the metadata DB, fan the query
  out as UNION ALL over per-node catalogs.
- ``processFrom`` (:185)   — strip the joined metadata table from FROM.
- ``processWhere`` (:210)  — recursive prune of the predicate tree,
  collapsing consumed branches to boolean literals (AND of two removed
  conjuncts → TRUE, OR → FALSE, single side removed → other side).
- ``checkCond`` (:280)     — a leaf is a *metadata* predicate when its text
  mentions feature/shape/node (substring match, intentionally catching
  st_* spatial calls on those tables).
- ``checkCondBackend`` (:303) — in the forward (metadata-DB) query, a leaf
  is dropped when it mentions neither feature nor shape, or mentions
  measurements.

The rewrite is plain text/tree manipulation over the WHERE conjunct tree —
no Catalyst extension, matching SURVEY.md §7.4's plan. Unlike the
reference (hardcoded live PostGIS, ``SenSQLModule.java:75-79``), the
metadata source is a parameter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# --- boolean expression tree over opaque leaf predicates -------------------


@dataclass
class Leaf:
    text: str


@dataclass
class Not:
    child: "Node"


@dataclass
class BoolOp:
    op: str  # 'AND' | 'OR'
    left: "Node"
    right: "Node"


@dataclass
class Literal:
    value: bool


Node = Leaf | Not | BoolOp | Literal

_TOKEN_RE = re.compile(r"\(|\)|'(?:[^']|'')*'|[^()'\s]+|\s+", re.DOTALL)


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.findall(text) if t.strip()]


def parse_where(text: str) -> Node:
    """Parse a WHERE expression into an AND/OR/NOT tree with opaque leaves.

    Leaves keep their original text (function calls, comparisons,
    BETWEEN...). Parentheses that wrap boolean structure recurse;
    parentheses that belong to function calls stay inside the leaf.
    """
    toks = _tokens(text)
    pos = 0

    def parse_or() -> Node:
        nonlocal pos
        node = parse_and()
        while pos < len(toks) and toks[pos].upper() == "OR":
            pos += 1
            node = BoolOp("OR", node, parse_and())
        return node

    def parse_and() -> Node:
        nonlocal pos
        node = parse_not()
        while pos < len(toks) and toks[pos].upper() == "AND":
            pos += 1
            node = BoolOp("AND", node, parse_not())
        return node

    def parse_not() -> Node:
        nonlocal pos
        if pos < len(toks) and toks[pos].upper() == "NOT":
            pos += 1
            return Not(parse_not())
        return parse_primary()

    def parse_primary() -> Node:
        nonlocal pos
        # A parenthesized boolean group only if it contains top-level AND/OR.
        if toks[pos] == "(":
            depth, j, has_bool = 0, pos, False
            while j < len(toks):
                if toks[j] == "(":
                    depth += 1
                elif toks[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                elif depth == 1 and toks[j].upper() in ("AND", "OR"):
                    has_bool = True
                j += 1
            if has_bool:
                pos += 1
                inner = parse_or()
                pos += 1  # closing paren
                return inner
        # opaque leaf: consume until a top-level AND/OR/closing-paren
        depth = 0
        parts: list[str] = []
        while pos < len(toks):
            t = toks[pos]
            if t == "(":
                depth += 1
            elif t == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.upper() in ("AND", "OR"):
                # BETWEEN x AND y: the AND belongs to the leaf
                if t.upper() == "AND" and any(p.upper() == "BETWEEN" for p in parts) and not any(
                    p.upper() == "AND" for p in parts
                ):
                    pass
                else:
                    break
            parts.append(t)
            pos += 1
        return Leaf(_join_tokens(parts))

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"unparsed WHERE tail: {' '.join(toks[pos:])!r}")
    return node


def _join_tokens(parts: list[str]) -> str:
    out = ""
    for p in parts:
        if p in (")", ","):
            out = out.rstrip()
        out += p
        out += "" if p == "(" else " "
        if p == "(":
            out = out.rstrip() + ""
    # normalize: no space before '(' after an identifier (function calls) —
    # but keep it after SQL keywords (IN (...), EXISTS (...)).
    return re.sub(
        r"(?<![a-zA-Z0-9_'])\s+\(|(?<=\w)\s+\(",
        lambda m: " (" if re.search(r"\b(in|exists|not|and|or|any|all|some|between)\s+\($", m.string[: m.end()], re.IGNORECASE) else "(",
        out,
    ).strip()


def render(node: Node) -> str:
    if isinstance(node, Literal):
        return "TRUE" if node.value else "FALSE"
    if isinstance(node, Leaf):
        return node.text
    if isinstance(node, Not):
        return f"NOT ({render(node.child)})"
    return f"({render(node.left)} {node.op} {render(node.right)})"


# --- processWhere / checkCond mirrors --------------------------------------


def check_cond(leaf_text: str) -> bool:
    """SenSQLModule.checkCond:280 — metadata predicate detector."""
    t = leaf_text.lower()
    return "feature" in t or "shape" in t or "node" in t


def check_cond_backend(leaf_text: str) -> bool:
    """SenSQLModule.checkCondBackend:303 — drop from the forward query."""
    t = leaf_text.lower()
    return ("feature" not in t and "shape" not in t) or "measurements" in t


def process_where(node: Node, should_remove) -> Node:
    """SenSQLModule.processWhere:210 — prune leaves, collapse literals."""
    if isinstance(node, BoolOp):
        left = process_where(node.left, should_remove)
        right = process_where(node.right, should_remove)
        lb, rb = isinstance(left, Literal), isinstance(right, Literal)
        if lb and rb:
            return Literal(True)
        if lb:
            return right
        if rb:
            return left
        lrem, rrem = _removable(left, should_remove), _removable(right, should_remove)
        if lrem and rrem:
            return Literal(node.op == "AND")
        if lrem:
            return right
        if rrem:
            return left
        return BoolOp(node.op, left, right)
    if isinstance(node, Not):
        # Removal semantics invert under negation (a consumed leaf stands
        # for TRUE, but NOT(TRUE) would wrongly collapse to FALSE), so a
        # NOT subtree is only consumable as a UNIT: every leaf removable →
        # the whole negation was answered by the metadata plane. A mix of
        # metadata and measurement leaves under one NOT cannot be split
        # soundly — reject it loudly instead of leaking leaves to the
        # wrong engine (round-1 advice).
        if _removable(node, should_remove):
            return Literal(True)
        if _contains_removable(node.child, should_remove):
            raise ValueError(
                "cannot split NOT over mixed metadata/measurement "
                f"predicates: NOT ({render(node.child)})"
            )
        return node
    if isinstance(node, Leaf) and should_remove(node.text):
        return Literal(True)
    return node


def _removable(node: Node, should_remove) -> bool:
    """True when EVERY leaf under ``node`` is removable (consumable whole)."""
    if isinstance(node, Leaf):
        return should_remove(node.text)
    if isinstance(node, Not):
        return _removable(node.child, should_remove)
    if isinstance(node, BoolOp):
        return _removable(node.left, should_remove) and _removable(
            node.right, should_remove
        )
    return False


def _contains_removable(node: Node, should_remove) -> bool:
    if isinstance(node, Leaf):
        return should_remove(node.text)
    if isinstance(node, Not):
        return _contains_removable(node.child, should_remove)
    if isinstance(node, BoolOp):
        return _contains_removable(node.left, should_remove) or _contains_removable(
            node.right, should_remove
        )
    return False


# --- FROM processing --------------------------------------------------------

_METADATA_TABLES = {"feature", "shape", "nodes", "node"}


def process_from(from_text: str) -> str:
    """SenSQLModule.processFrom:185 — drop metadata tables from FROM.

    The reference handles exactly a two-relation comma join and strips
    'feature'; we generalize to dropping every metadata-catalog table from
    a comma-separated FROM list (the SenSQL query shape), returning the
    single remaining measurement table.
    """
    tables = [t.strip() for t in from_text.split(",")]
    kept = [t for t in tables if t.split()[0].lower() not in _METADATA_TABLES]
    if len(kept) != 1:
        raise ValueError(f"expected one measurement table in FROM, got {kept!r}")
    return kept[0].split()[0]


# --- top-level query splitting ---------------------------------------------

_CLAUSE_RE = re.compile(
    r"^(?P<head>select\b.*?)\bfrom\b(?P<from>.*?)"
    r"(?:\bwhere\b(?P<where>.*?))?"
    r"(?P<tail>\b(?:group\s+by|having|window|order\s+by|limit)\b.*)?$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class SplitQuery:
    head: str  # 'SELECT ...'
    from_text: str
    where_text: str | None
    tail: str  # 'GROUP BY ... ORDER BY ...' or ''


def split_query(sql: str) -> SplitQuery:
    """Split a single query-spec into clauses (paren-free top level only).

    SenSQL queries are flat SELECT ... FROM t1, t2 WHERE ... [GROUP BY ...]
    — same scope the reference's rewrite handles (a lone
    QuerySpecification, ``DispatchManager.java:204-217``).
    """
    m = _CLAUSE_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(f"unsupported SenSQL query shape: {sql!r}")
    return SplitQuery(
        head=m.group("head").strip(),
        from_text=m.group("from").strip(),
        where_text=(m.group("where") or "").strip() or None,
        tail=(m.group("tail") or "").strip(),
    )


FORWARD_PREFIX = (
    "select nodes.id from nodes, feature, shape where "
    "st_intersects(shape.geometries, nodes.service_region) "
    "and shape.id = feature.shape"
)


def build_forward_query(where_text: str | None) -> str:
    """The metadata-DB node-resolution query (SenSQLModule.java:103-146)."""
    if where_text is None:
        return f"{FORWARD_PREFIX} group by nodes.id"
    tree = parse_where(where_text)
    # check_cond_backend already answers "remove this leaf?" directly.
    pruned = process_where(tree, check_cond_backend)
    cond = render(pruned)
    if cond in ("TRUE", "FALSE"):
        return f"{FORWARD_PREFIX} group by nodes.id"
    return f"{FORWARD_PREFIX} and {cond} group by nodes.id"


def build_residual_where(where_text: str | None) -> str | None:
    """The main query's WHERE with metadata predicates consumed."""
    if where_text is None:
        return None
    tree = parse_where(where_text)
    pruned = process_where(tree, check_cond)
    cond = render(pruned)
    return None if cond == "TRUE" else cond
