"""Differential expression fuzzer — the presto-verifier analog.

The reference ships ``presto-verifier`` (runs the same query against two
engines and diffs results); this module does the same for scalar
expressions: a seeded generator produces random expression trees from a
dialect-shared grammar (valid Spark SQL AND DuckDB SQL with identical
semantics), both engines evaluate them over the same deterministic
orders-x-customer slice, and results are compared cell-for-cell.

Grammar discipline (what keeps the two dialects semantically identical):

- integer + string expressions only — float formatting/rounding drift is
  the classic false-positive source, so doubles are excluded by
  construction;
- ``||`` for concatenation (NULL-propagating in both; Spark's
  ``concat`` is, DuckDB's is not);
- division excluded; ``%`` allowed with nonzero integer literal rhs
  (C-style sign semantics in both);
- multiplication depth is magnitude-tracked so products stay far from
  int64 overflow (ANSI Spark would raise, DuckDB would widen — either
  way a false diff);
- ``substr`` generated with start >= 1 only (negative-start semantics
  differ);
- NULL introducers (``nullif``) appear only where a NULL result is
  compared directly, never under ``least``/``greatest``;
- no CAST of a fractional double to an integer type: DuckDB ROUNDS on
  that cast while Spark truncates (a real divergence this harness
  surfaced via graph_pagerank — floor()/round() explicitly instead).

Usage: ``python tools/expr_fuzz.py [n_exprs] [seed]`` — prints each
mismatch and exits nonzero on any. The pytest wrapper pins seeds so CI is
deterministic.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# deterministic row slice both engines read (orders x customer join keeps
# one row per order); all referenced columns are NOT NULL in TPC-H data
_BASE = (
    "SELECT o_orderkey, o_custkey, c_nationkey, "
    "o_orderstatus, o_orderpriority, c_name, c_mktsegment "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "WHERE o_orderkey < 600 "
)

_INT_COLS = ("o_orderkey", "o_custkey", "c_nationkey")
_STR_COLS = ("o_orderstatus", "o_orderpriority", "c_name", "c_mktsegment")


class _Gen:
    """Seeded expression generator. ``magnitude`` tracks a loose upper
    bound of |value| so integer expressions never approach overflow."""

    def __init__(self, seed: int):
        self.rng = random.Random(seed)

    # --- integer expressions -------------------------------------------
    def int_expr(self, depth: int) -> tuple[str, float]:
        r = self.rng
        if depth <= 0:
            if r.random() < 0.5:
                c = r.choice(_INT_COLS)
                return c, 2_000_000.0
            v = r.randint(-99, 99)
            return str(v), abs(v) + 1.0
        pick = r.random()
        if pick < 0.25:
            a, ma = self.int_expr(depth - 1)
            b, mb = self.int_expr(depth - 1)
            op = r.choice(("+", "-"))
            return f"({a} {op} {b})", ma + mb
        if pick < 0.40:
            a, ma = self.int_expr(depth - 1)
            b, mb = self.int_expr(0)
            if ma * mb < 1e14:  # keep far from int64 range
                return f"({a} * {b})", ma * mb
            return a, ma
        if pick < 0.50:
            a, ma = self.int_expr(depth - 1)
            m = r.randint(2, 97)
            return f"({a} % {m})", float(m)
        if pick < 0.60:
            a, ma = self.int_expr(depth - 1)
            return f"abs({a})", ma
        if pick < 0.72:
            a, ma = self.int_expr(depth - 1)
            b, mb = self.int_expr(depth - 1)
            fn = r.choice(("least", "greatest"))
            return f"{fn}({a}, {b})", max(ma, mb)
        if pick < 0.84:
            s, _ = self.str_expr(depth - 1)
            return f"length({s})", 4_000.0
        # CASE over an integer predicate
        p = self.bool_expr(depth - 1)
        a, ma = self.int_expr(depth - 1)
        b, mb = self.int_expr(depth - 1)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)", max(ma, mb)

    # --- string expressions --------------------------------------------
    def str_expr(self, depth: int) -> tuple[str, None]:
        r = self.rng
        if depth <= 0:
            if r.random() < 0.6:
                return r.choice(_STR_COLS), None
            lit = "".join(r.choice("abcxyz ") for _ in range(r.randint(1, 6)))
            return f"'{lit}'", None
        pick = r.random()
        if pick < 0.25:
            a, _ = self.str_expr(depth - 1)
            b, _ = self.str_expr(depth - 1)
            return f"({a} || {b})", None
        if pick < 0.45:
            a, _ = self.str_expr(depth - 1)
            fn = r.choice(("upper", "lower", "trim", "reverse"))
            return f"{fn}({a})", None
        if pick < 0.60:
            a, _ = self.str_expr(depth - 1)
            start = r.randint(1, 5)
            ln = r.randint(1, 8)
            return f"substr({a}, {start}, {ln})", None
        if pick < 0.75:
            a, _ = self.str_expr(depth - 1)
            old = self.rng.choice("aeilnorst")
            new = self.rng.choice("AEILNORST_")
            return f"replace({a}, '{old}', '{new}')", None
        p = self.bool_expr(depth - 1)
        a, _ = self.str_expr(depth - 1)
        b, _ = self.str_expr(depth - 1)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)", None

    # --- boolean predicates --------------------------------------------
    def bool_expr(self, depth: int) -> str:
        r = self.rng
        if depth <= 0 or r.random() < 0.5:
            a, _ = self.int_expr(max(depth - 1, 0))
            b, _ = self.int_expr(max(depth - 1, 0))
            op = r.choice(("<", "<=", ">", ">=", "=", "<>"))
            return f"({a} {op} {b})"
        if r.random() < 0.5:
            a, _ = self.str_expr(depth - 1)
            b, _ = self.str_expr(depth - 1)
            return f"({a} = {b})"
        p = self.bool_expr(depth - 1)
        q = self.bool_expr(depth - 1)
        op = r.choice(("AND", "OR"))
        return f"({p} {op} {q})"

    def top_expr(self) -> str:
        """One output column: int, string, or a NULL-exercising variant."""
        pick = self.rng.random()
        if pick < 0.40:
            e, _ = self.int_expr(3)
            return f"CAST({e} AS BIGINT)"
        if pick < 0.75:
            e, _ = self.str_expr(3)
            return e
        if pick < 0.90:
            # NULL path: nullif compared/coalesced at top level only
            a, _ = self.int_expr(2)
            b, _ = self.int_expr(1)
            c, _ = self.int_expr(1)
            return f"CAST(coalesce(nullif({a}, {b}), {c}) AS BIGINT)"
        a, _ = self.str_expr(2)
        b, _ = self.str_expr(1)
        return f"nullif({a}, {b})"


def _run_and_compare(spark, sf_dir, q, seeds, label, text_cols=False):
    """Shared execute-and-diff loop for every fuzz mode: run the query on
    both engines, compare each seed column NaN-aware cell-by-cell (as
    strings when text_cols — datetime mode mixes date/str outputs)."""
    from sensql_presto_spark import catalog
    from sensql_presto_spark.testing import duckdb_connection

    actual = catalog.sql(spark, sf_dir, q).toPandas()
    con = duckdb_connection(sf_dir)
    expected = con.sql(q).df()
    con.close()
    problems = []
    if len(actual) != len(expected):
        return [f"{label}: row count differs: spark={len(actual)} duckdb={len(expected)}"]
    for s in seeds:
        col = f"e{s}"
        av, ev = actual[col], expected[col]
        if text_cols:
            av, ev = av.astype(str), ev.astype(str)
        eq = (av == ev) | (av.isna() & ev.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"{label} seed {s}: row {i} spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems


def build_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        cols.append(f"{_Gen(s).top_expr()} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    """Returns a list of mismatch descriptions (empty = all agree)."""
    return _run_and_compare(spark, sf_dir, build_query(seeds), seeds, "scalar")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from sensql_presto_spark.session import get_spark

    spark = get_spark()
    sf_dir = "/root/testdata/sf0.01"
    all_problems = []
    batch = 30  # 30 expression columns per query keeps plans compilable
    seeds = list(range(seed0, seed0 + n))
    for i in range(0, len(seeds), batch):
        all_problems += run_batch(spark, sf_dir, seeds[i : i + batch])
    for p in all_problems:
        print("MISMATCH", p)
    print(f"{n - len(all_problems)}/{n} expressions agree")
    sys.exit(1 if all_problems else 0)


if __name__ == "__main__":
    main()


# --- aggregation mode: the same grammar under GROUP BY --------------------
#
# Wraps generated integer expressions in SUM/COUNT/MIN/MAX and groups by a
# generated string expression — fuzzing the partial/final aggregation path
# (map-side combine + exchange) against DuckDB's single-node aggregation.
# Sums of |e| <= ~1e7 over <= 600 rows stay far from int64 overflow.


def build_agg_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        e, _ = g.int_expr(2)
        fn = g.rng.choice(("sum", "count", "min", "max"))
        cols.append(f"CAST({fn}({e}) AS BIGINT) AS e{s}")
    grp = _Gen(seeds[0] ^ 0x5EED).str_expr(2)[0]
    return (
        "SELECT "
        + grp
        + " AS g, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t GROUP BY "
        + grp
        + " ORDER BY g"
    )


def run_agg_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(spark, sf_dir, build_agg_query(seeds), seeds, "agg")


# --- window mode: ranking/aggregate window functions --------------------
#
# row_number is made deterministic by a full-order tiebreak (o_orderkey);
# rank/dense_rank/sum/min/max/count OVER are deterministic for any
# ordering. Frames are left at each function's default (RANGE UNBOUNDED
# PRECEDING for aggregates — identical defaults in both dialects).


def build_window_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        part, _ = g.str_expr(1)
        order, _ = g.int_expr(2)
        fn = g.rng.choice(
            ("row_number()", "rank()", "dense_rank()", "count(*)", None, None)
        )
        if fn is None:
            e, _ = g.int_expr(1)
            agg = g.rng.choice(("sum", "min", "max"))
            fn = f"{agg}({e})"
        cols.append(
            f"CAST({fn} OVER (PARTITION BY {part} "
            f"ORDER BY {order}, o_orderkey) AS BIGINT) AS e{s}"
        )
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_window_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(spark, sf_dir, build_window_query(seeds), seeds, "window")


# --- datetime mode: the dialect-shared date grammar ----------------------
#
# Date arithmetic is a classic divergence area; the shared subset here is
# extracts (year/month/day), date_trunc, INTERVAL literal addition, date
# comparisons and min/max via CASE. Excluded by construction: datediff
# (argument conventions differ), date_add (int-days in Spark, interval in
# DuckDB), and fractional casts. o_orderdate is cast to DATE once at the
# base.


def _date_expr(g: "_Gen", depth: int) -> str:
    r = g.rng
    if depth <= 0:
        return "d"
    pick = r.random()
    if pick < 0.30:
        unit = r.choice(("year", "quarter", "month", "week", "day"))
        return f"CAST(date_trunc('{unit}', {_date_expr(g, depth - 1)}) AS DATE)"
    if pick < 0.60:
        n = r.randint(1, 400)
        unit = r.choice(("DAY", "MONTH", "YEAR"))
        op = r.choice(("+", "-"))
        # CAST back to DATE: DuckDB widens DATE +/- INTERVAL to TIMESTAMP
        # (same instant, different type/rendering), Spark keeps DATE
        return f"CAST(({_date_expr(g, depth - 1)} {op} INTERVAL {n} {unit}) AS DATE)"
    a = _date_expr(g, depth - 1)
    b = _date_expr(g, depth - 1)
    return f"(CASE WHEN {a} < {b} THEN {a} ELSE {b} END)"


def build_datetime_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        e = _date_expr(g, 3)
        out = g.rng.choice(
            (
                f"CAST(year({e}) AS BIGINT)",
                f"CAST(month({e}) AS BIGINT)",
                f"CAST(day({e}) AS BIGINT)",
                f"CAST({e} AS STRING)",
            )
        )
        cols.append(f"{out} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d"
        + "       FROM orders WHERE o_orderkey < 600) t ORDER BY o_orderkey"
    )


def run_datetime_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(spark, sf_dir, build_datetime_query(seeds), seeds,
                            "datetime", text_cols=True)


# --- tpcds mode: correlated subqueries + ROLLUP compositions --------------
#
# The TPC-DS tail (q41-q99) leans on two shapes the other modes never
# generate: correlated scalar subqueries (decorrelated by Catalyst into
# aggregated outer joins) and ROLLUP grouping sets.  This mode fuzzes
# random compositions of both over the star schema: per-order lineitem
# aggregates correlated on the fact key, EXISTS probes, and rollups whose
# aggregate inputs can be the correlated column itself.  All-integer
# outputs (sums bounded far below int64); rollup rows are made
# order-deterministic by sorting on the grouping() markers first, with
# explicit NULLS FIRST (Spark's ASC default; DuckDB defaults NULLS LAST).

_LI_AGGS = ("count(*)", "min(l.l_linenumber)", "max(l.l_suppkey)", "sum(l.l_linenumber)")
_LI_PRED_COLS = ("l.l_linenumber", "l.l_suppkey", "l.l_partkey")


def _li_subquery(r) -> str:
    """One correlated scalar subquery over lineitem: equality correlation
    on the fact key (the decorrelatable shape), random local predicate,
    integer aggregate, coalesce for empty groups."""
    agg = r.choice(_LI_AGGS)
    c = r.choice(_LI_PRED_COLS)
    k, j = r.randint(2, 7), r.randint(0, 1)
    pred = f"{c} % {k} {r.choice(('=', '<>', '<'))} {j}"
    return (
        f"CAST(coalesce((SELECT {agg} FROM lineitem l "
        f"WHERE l.l_orderkey = t.o_orderkey AND {pred}), -1) AS BIGINT)"
    )


def build_subquery_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        if g.rng.random() < 0.25:
            c = g.rng.choice(_LI_PRED_COLS)
            k = g.rng.randint(2, 9)
            cols.append(
                f"CAST(CASE WHEN EXISTS (SELECT 1 FROM lineitem l WHERE "
                f"l.l_orderkey = t.o_orderkey AND {c} % {k} = 0) "
                f"THEN 1 ELSE 0 END AS BIGINT) AS e{s}"
            )
        else:
            cols.append(f"{_li_subquery(g.rng)} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_subquery_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(
        spark, sf_dir, build_subquery_query(seeds), seeds, "subquery"
    )


def build_rollup_query(seeds: list[int]) -> str:
    g0 = _Gen(seeds[0] ^ 0xD5)
    ga = g0.str_expr(1)[0]
    gb = g0.str_expr(1)[0]
    while gb == ga:
        gb = g0.str_expr(1)[0]
    sub = _li_subquery(g0.rng)
    cols = []
    for s in seeds:
        g = _Gen(s)
        term = "lc" if g.rng.random() < 0.4 else g.int_expr(2)[0]
        fn = g.rng.choice(("sum", "count", "min", "max"))
        cols.append(f"CAST({fn}({term}) AS BIGINT) AS e{s}")
    return (
        "SELECT "
        + ga
        + " AS ga, "
        + gb
        + " AS gb, CAST(grouping("
        + ga
        + ") AS BIGINT) AS gm1, CAST(grouping("
        + gb
        + ") AS BIGINT) AS gm2, "
        + ", ".join(cols)
        + " FROM (SELECT t.*, "
        + sub
        + " AS lc FROM ("
        + _BASE
        + ") t) tt GROUP BY ROLLUP("
        + ga
        + ", "
        + gb
        + ") ORDER BY gm1, gm2, ga NULLS FIRST, gb NULLS FIRST"
    )


def run_rollup_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(
        spark, sf_dir, build_rollup_query(seeds), seeds, "rollup"
    )


# --- join mode: random multi-way join trees -------------------------------
#
# The other modes share one fixed two-table base; this mode fuzzes the
# JOIN SURFACE itself: per seed a fresh join tree over orders/customer/
# nation with a random outer flavor (INNER/LEFT/RIGHT/FULL), random
# EXTRA predicates in the ON clause (where outer-join bugs live — an
# ON-condition filters the null-extended side differently from WHERE),
# optional lineitem EXISTS/NOT EXISTS probes, and optional null-sensitive
# WHERE predicates over the nullable side.  Each seed reduces to one
# (seed, cnt, ck) row — count plus a null-sensitive integer checksum —
# and the whole batch runs as ONE UNION ALL query on both engines.  The
# orderkey bound sits INSIDE the left input, not the outer WHERE, so
# RIGHT/FULL null-extended rows survive to the checksum.


def build_join_query(seeds: list[int]) -> str:
    parts = []
    for s in seeds:
        r = _Gen(s).rng
        jt1 = r.choice(("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"))
        jt2 = r.choice(("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"))
        on1 = "o.o_custkey = c.c_custkey"
        if r.random() < 0.5:
            on1 += f" AND c.c_nationkey % {r.randint(2, 6)} = {r.randint(0, 1)}"
        on2 = "c.c_nationkey = n.n_nationkey"
        if r.random() < 0.5:
            on2 += f" AND n.n_regionkey % {r.randint(2, 4)} = {r.randint(0, 1)}"
        where = []
        if r.random() < 0.4:
            where.append(
                f"coalesce(n.n_nationkey, -1) % {r.randint(2, 5)} = {r.randint(0, 1)}"
            )
        if r.random() < 0.3:
            neg = "NOT " if r.random() < 0.5 else ""
            where.append(
                f"{neg}EXISTS (SELECT 1 FROM lineitem l WHERE "
                f"l.l_orderkey = o.o_orderkey AND l.l_linenumber % {r.randint(2, 4)} = 0)"
            )
        tree = (
            "(SELECT * FROM orders WHERE o_orderkey < 600) o "
            f"{jt1} customer c ON {on1} "
            f"{jt2} nation n ON {on2}"
        )
        q = (
            f"SELECT {s} AS seed, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(coalesce(sum(coalesce(o.o_orderkey, -3) * 3 "
            "+ coalesce(c.c_nationkey, -7) * 11 "
            "+ coalesce(n.n_nationkey, -13) * 101), 0) AS BIGINT) AS ck "
            f"FROM {tree}"
        )
        if where:
            q += " WHERE " + " AND ".join(where)
        parts.append(q)
    return " UNION ALL ".join(parts) + " ORDER BY seed"


def run_join_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    from sensql_presto_spark import catalog
    from sensql_presto_spark.testing import duckdb_connection

    q = build_join_query(seeds)
    actual = catalog.sql(spark, sf_dir, q).toPandas()
    con = duckdb_connection(sf_dir)
    expected = con.sql(q).df()
    con.close()
    problems = []
    if len(actual) != len(expected):
        return [f"join: row count differs: spark={len(actual)} duckdb={len(expected)}"]
    for col in ("cnt", "ck"):
        av, ev = actual[col], expected[col]
        eq = (av == ev) | (av.isna() & ev.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"join seed {int(actual['seed'][i])} ({col}): "
                f"spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems


# --- text mode: regex / padding / hashing string shapes --------------------
#
# The r7 verdict asked for string/regex-heavy fuzz weight toward the text
# operators (winnowing grams, BPE merges, pattern-match alphabets).  This
# mode generates string expressions over a VERIFIED dialect-shared
# function set: regexp_extract with whitelisted RE2∩Java patterns (no
# lookaround/backrefs — DuckDB is RE2, Spark is java.util.regex; both
# return '' on no match for group 0), position(sub IN s), lpad/rpad
# (pad-or-truncate in both), left/right (n >= 1), repeat, translate with
# equal-length alphabets (unequal lengths delete in both, but stay
# conservative), md5 (lowercase hex in both), and LIKE over a
# metacharacter-free literal charset.  regexp_replace is EXCLUDED by
# design: DuckDB replaces the first match by default where Spark replaces
# all.  Outputs compare as strings.

_SAFE_PATTERNS = (
    "[0-9]+", "[a-z]+", "[A-Z][a-z]+", "Cu[a-z]*", "[aeiou]{2}",
    "[A-Z]{2,4}", "(er|or|ng)", "[#0-9]+",
)


def _text_expr(g: "_Gen", depth: int) -> str:
    r = g.rng
    if depth <= 0:
        if r.random() < 0.7:
            return r.choice(_STR_COLS)
        lit = "".join(r.choice("abcxyz. #") for _ in range(r.randint(1, 5)))
        return f"'{lit}'"
    pick = r.random()
    a = _text_expr(g, depth - 1)
    if pick < 0.14:
        return f"regexp_extract({a}, '{r.choice(_SAFE_PATTERNS)}', 0)"
    if pick < 0.26:
        fn = r.choice(("lpad", "rpad"))
        pad = r.choice("._xo")
        return f"{fn}({a}, {r.randint(1, 15)}, '{pad}')"
    if pick < 0.38:
        fn = r.choice(("left", "right"))
        return f"{fn}({a}, {r.randint(1, 8)})"
    if pick < 0.46:
        return f"repeat(substr({a}, 1, {r.randint(1, 3)}), {r.randint(1, 3)})"
    if pick < 0.56:
        src = "AEIOUcnr"
        dst = "aeiouCNR"
        k = r.randint(2, len(src))
        return f"translate({a}, '{src[:k]}', '{dst[:k]}')"
    if pick < 0.64:
        b = _text_expr(g, depth - 1)
        return f"({a} || {b})"
    if pick < 0.72:
        fn = r.choice(("upper", "lower", "trim", "reverse"))
        return f"{fn}({a})"
    if pick < 0.80:
        needle = "".join(r.choice("abcdexyz#0123") for _ in range(r.randint(1, 3)))
        return f"(CASE WHEN {a} LIKE '%{needle}%' THEN {_text_expr(g, 0)} ELSE {a} END)"
    if pick < 0.88:
        needle = r.choice("aeou#123")
        b = _text_expr(g, depth - 1)
        return f"(CASE WHEN position('{needle}' IN {a}) > {r.randint(0, 4)} THEN {a} ELSE {b} END)"
    return f"md5({a})"


def build_text_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        cols.append(f"{_text_expr(g, 3)} AS e{s}")
    return "SELECT o_orderkey, " + ",\n       ".join(cols) + " FROM (" + _BASE + ") ORDER BY o_orderkey"


def run_text_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(
        spark, sf_dir, build_text_query(seeds), seeds, "text", text_cols=True
    )


# --- negdiv mode: trunc-vs-floor division across dialects -------------------
#
# The one arithmetic divergence the engine's exact-integer rules exist
# for: Spark's integer DIV truncates toward zero while DuckDB's //
# FLOORS, so any negative numerator meeting division silently diverges
# (the r8 verdict caught a latent case in events_decay_score).  This
# mode is the regression hunter for that class: unlike every other mode
# it generates a dialect PAIR — the same expression tree rendered once
# with Spark spellings (DIV, shiftleft) and once with DuckDB spellings
# (//, <<) — and fuzzes exactly the sign-handling idioms the operators
# rely on:
#
#   trunc:   CASE WHEN e >= 0 THEN e DIV d ELSE -((-e) DIV d) END
#            (both engines divide a non-negative numerator, where trunc
#            and floor agree; the sign is reapplied outside)
#   nonneg:  abs(e) DIV d
#   shift:   (e + M) DIV d with M > |e|'s magnitude bound — the
#            "+2000 positivity shift" pattern from the embedding ops
#   identity: e = d * trunc(e, d) + (e % d) — both engines' % is
#            C-style (sign of the dividend), so the identity must hold
#            cell-for-cell; a 0 anywhere means an engine broke the
#            trunc-div/% contract this repo's arithmetic assumes
#
# Divisors are positive literals or powers of two via shiftleft/<<
# (the decay-score shape).  Raw `e DIV d` with a possibly-negative e is
# deliberately NOT generated — it WOULD mismatch; the grammar encodes
# the rule, the fuzz proves the encodings.


def _pow2(k: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {k})"
    return f"(CAST(1 AS BIGINT) << {k})"


def _negdiv_col(g: "_Gen", dialect: str) -> str:
    r = g.rng
    div = "DIV" if dialect == "spark" else "//"
    e, mag = g.int_expr(2)
    if r.random() < 0.5:
        d = str(r.randint(2, 97))
    else:
        d = _pow2(r.randint(1, 12), dialect)
    pick = r.random()
    if pick < 0.35:
        trunc = f"(CASE WHEN {e} >= 0 THEN ({e}) {div} {d} ELSE -((-({e})) {div} {d}) END)"
        return f"CAST({trunc} AS BIGINT)"
    if pick < 0.55:
        return f"CAST(abs({e}) {div} {d} AS BIGINT)"
    if pick < 0.75:
        shift = int(mag) + 1
        if shift < 9e15:  # stay far from int64
            return f"CAST((({e}) + {shift}) {div} {d} AS BIGINT)"
        return f"CAST(abs({e}) {div} {d} AS BIGINT)"
    # the trunc-div / modulo identity as a 0/1 sentinel column
    trunc = f"(CASE WHEN {e} >= 0 THEN ({e}) {div} {d} ELSE -((-({e})) {div} {d}) END)"
    return f"CAST(CASE WHEN ({e}) = {d} * {trunc} + (({e}) % {d}) THEN 1 ELSE 0 END AS BIGINT)"


def build_negdiv_query(seeds: list[int], dialect: str) -> str:
    cols = []
    for s in seeds:
        # one generator per (seed, column); dialect must NOT perturb the
        # random stream, so each dialect rendering re-seeds identically
        cols.append(f"{_negdiv_col(_Gen(s), dialect)} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_negdiv_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    from sensql_presto_spark import catalog
    from sensql_presto_spark.testing import duckdb_connection

    actual = catalog.sql(spark, sf_dir, build_negdiv_query(seeds, "spark")).toPandas()
    con = duckdb_connection(sf_dir)
    expected = con.sql(build_negdiv_query(seeds, "duckdb")).df()
    con.close()
    problems = []
    if len(actual) != len(expected):
        return [
            f"negdiv: row count differs: spark={len(actual)} duckdb={len(expected)}"
        ]
    for s in seeds:
        col = f"e{s}"
        av, ev = actual[col], expected[col]
        eq = (av == ev) | (av.isna() & ev.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"negdiv seed {s}: row {i} spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems


# --- decimal mode: precision/scale arithmetic across dialects ---------------
#
# (r9 VERDICT next-round #6: give the cents-quantization convention the
# same adversarial hunt negdiv gives integer division.)  The repo's money
# and score arithmetic lives on quantized DECIMALs, and probing (r10)
# found FIVE genuine engine divergences the grammar must encode as
# rules, exactly the way negdiv encodes the trunc-vs-floor rule (the
# fourth and fifth were found LIVE by this mode's own second and third
# batches — the fuzzer earning its keep; rule 5 is documented at the
# round() branch in _dec_expr):
#
#   * CAST(dec AS DECIMAL(p, smaller_s)) — Spark rescales HALF_UP while
#     DuckDB rescales HALF_EVEN (0.25 -> 0.3 vs 0.2), so scale reduction
#     is ONLY generated through round(x, k), which both engines evaluate
#     as HALF_UP away from zero for either sign (probed at the .5 and
#     .00005 boundaries, both signs).
#   * CAST(non-integer dec AS BIGINT) — Spark truncates toward zero,
#     DuckDB ROUNDS (2.7 -> 2 vs 3; the double->int analog of the rule
#     already in the scalar grammar header), so only integer-valued
#     decimals may cross to BIGINT: every output column is integerized
#     as round(expr * 10^scale, 0) first.
#   * decimal / decimal — DuckDB's quotient is a DOUBLE while Spark's is
#     a HALF_UP DECIMAL at a derived scale; quantizing the two can split
#     at a digit boundary by one ulp, so engine-native decimal division
#     is EXCLUDED (the operators divide integers via the negdiv idioms).
#   * least()/greatest() over DECIMALs — DuckDB returns DOUBLE
#     UNCONDITIONALLY (even at identical scales), so a downstream
#     round() sees the nearest-double (e.g. 81787.885 -> 81787.88499...
#     -> .88) while Spark's stays decimal (-> .89).  Found by seed
#     174007 in the nineteenth batch: the first-batch grammar allowed
#     same-scale least/greatest and 700 seeds passed before one landed a
#     product on a .xx5 boundary.  min/max is generated as a comparison
#     CASE instead (decimal comparisons and CASE results stay exact
#     decimals in both engines).  Repo operators are unaffected — every
#     operator least()/greatest() runs over BIGINT or explicit DOUBLE.
#
# Inside those rules the mode fuzzes: column/literal atoms at scales 0-4,
# +/-/* with precision- and magnitude-tracked operands (results stay far
# from the 38-digit cap, where Spark's allowPrecisionLoss would silently
# truncate scale), abs/negation, %% by a positive integer (C-style sign in
# both, probed), round() at reduced/zero/negative digits, and same-scale
# min/max CASEs.


def _dec_literal(r, scale: int) -> "tuple[str, int, int, float]":
    unscaled = r.randint(-(10**5), 10**5)
    if scale == 0:
        return f"(CAST({unscaled} AS DECIMAL(10,0)))", 10, 0, float(abs(unscaled))
    sign = "-" if unscaled < 0 else ""
    digits = str(abs(unscaled)).rjust(scale + 1, "0")
    lit = f"{sign}{digits[:-scale]}.{digits[-scale:]}"
    return f"({lit})", 10, scale, abs(unscaled) / 10**scale


def _dec_expr(g: "_Gen", depth: int) -> "tuple[str, int, int, float]":
    """Returns (sql, precision, scale, vbound) with vbound >= |value|."""
    r = g.rng
    if depth <= 0 or r.random() < 0.30:
        pick = r.random()
        if pick < 0.35:
            col = r.choice(_INT_COLS)
            m = r.randint(3, 9999)
            return f"(CAST({col} % {m} AS DECIMAL(10,0)))", 10, 0, float(m)
        if pick < 0.70:
            col = r.choice(_INT_COLS)
            m = r.randint(3, 9999)
            k = r.randint(1, 4)
            lit = "0." + "0" * (k - 1) + "1"
            return (
                f"(CAST({col} % {m} AS DECIMAL(10,0)) * {lit})",
                11 + k,
                k,
                m / 10**k,
            )
        return _dec_literal(r, r.randint(0, 4))
    a, pa, sa, va = _dec_expr(g, depth - 1)
    pick = r.random()
    if pick < 0.12:
        return f"(abs({a}))", pa, sa, va
    if pick < 0.22:
        return f"(- {a})", pa, sa, va
    if pick < 0.34:
        # round at a reduced / zero / negative number of digits.  For
        # k < 0 the operand is first WIDENED to DECIMAL(28, sa): rule 5
        # — DuckDB 1.0 returns 0 from round(DECIMAL(p,s), k<0) whenever
        # |k| >= p - s (the type's integer-digit capacity; e.g.
        # round(-99.074 :: DECIMAL(5,3), -2) = 0, not -100) while Spark
        # widens and rounds correctly; found live by seeds 176144/
        # 176271/177080/177141/177290 in the twentieth batch.  The
        # widening cast is same-scale (exact in both engines) and lifts
        # p - s to 28 - sa, far above any generated |k|.
        k = r.randint(-2, max(sa - 1, 0))
        if k < 0:
            operand = f"CAST({a} AS DECIMAL(28,{sa}))"
            return f"(round({operand}, {k}))", 29, 0, va + 10.0 ** (-k)
        return f"(round({a}, {k}))", pa + 1, k, va + 10.0 ** (-k)
    if pick < 0.44:
        d = r.randint(2, 997)
        return f"({a} % {d})", pa, sa, float(d)
    if pick < 0.54:
        # min/max via comparison CASE, NOT least()/greatest(): rule 4
        # below — found live by THIS mode's second batch (seed 174007).
        b, pb, _sb, vb = _dec_literal(r, sa)
        op = "<=" if r.random() < 0.5 else ">="
        return (
            f"(CASE WHEN {a} {op} {b} THEN {a} ELSE {b} END)",
            max(pa, pb),
            sa,
            max(va, vb),
        )
    b, pb, sb, vb = _dec_expr(g, depth - 1)
    if pick < 0.80 or pa + pb + 1 > 32 or va * vb * 10 ** (sa + sb) > 1e14 or sa + sb > 6:
        s = max(sa, sb)
        p = max(pa - sa, pb - sb) + s + 1
        if (va + vb) * 10**s > 1e14 or p > 36:
            return a, pa, sa, va
        op = "+" if r.random() < 0.5 else "-"
        return f"({a} {op} {b})", p, s, va + vb
    return f"({a} * {b})", pa + pb + 1, sa + sb, va * vb


def build_decimal_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        e, _p, sc, vb = _dec_expr(g, 3)
        # integerize (rule 2): value * 10^scale is integer-valued, so the
        # BIGINT cast is exact in both engines; vbound keeps it in-range.
        # The widening cast (same scale, larger precision — exact in both)
        # is load-bearing: the product keeps scale `sc`, so its UNSCALED
        # magnitude is value * 10^(2*sc), which overflows DuckDB's
        # 18-digit intermediate without it (<= 9e20 < 10^28 with it).
        assert vb * 10**sc < 9e14
        cols.append(
            f"CAST(round(CAST({e} AS DECIMAL(28,{sc})) * {10**sc}, 0) "
            f"AS BIGINT) AS e{s}"
        )
    return (
        "SELECT o_orderkey, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_decimal_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(
        spark, sf_dir, build_decimal_query(seeds), seeds, "decimal"
    )


# --- decagg mode: DECIMAL arithmetic under aggregation (r10 VERDICT #5) -----
#
# The decimal mode's expressions, pushed through the partial/final
# aggregation path: the operators aggregate quantized cents, and the
# engines WIDEN differently — Spark sum(DECIMAL(p,s)) is DECIMAL(p+10,s)
# (partial sums overflow-checked at p+10) while DuckDB's is
# DECIMAL(38,s); both are exact for in-range values, so sums compare
# after the same integerization the scalar decimal mode uses.  Two more
# probed dialect rules join the mode's grammar:
#
#   * avg(DECIMAL(p,s)) is EXCLUDED: Spark returns DECIMAL(p+4, s+4) —
#     the exact rational rounded HALF_UP at scale s+4 — while DuckDB
#     returns a DOUBLE (the nearest double of the rational).  For any
#     non-terminating rational (sum 0.04 over 3 rows: 0.013333 vs
#     0.01333333333333333...) the representations differ structurally,
#     and at s+4-digit boundaries even quantizing DuckDB's double
#     diverges (the least/greatest nearest-double effect, rule 4).  The
#     repo's operators compute averages as integer-sum / count through
#     the negdiv idioms instead.
#   * sum() magnitude: the UNSCALED running sum must stay within BOTH
#     engines' exactness envelope; the generator bounds
#     rows x vbound x 10^scale < 9e14 (star-joined slice <= 600 rows),
#     far under the 2^63 BIGINT cast and Spark's p+10 headroom.
#
# Inside the rules the mode fuzzes sum / sum(DISTINCT) / min / max /
# count over depth-2 decimal expressions, grouped by a generated string
# key — map-side partial aggregation + exchange + final merge on the
# Spark side vs DuckDB's single-node hash aggregate.


def build_decagg_query(seeds: list[int]) -> str:
    cols = []
    for s in seeds:
        g = _Gen(s)
        e, _p, sc, vb = _dec_expr(g, 2)
        # 600-row slice: unscaled sum bound rows * vb * 10^sc must stay
        # exact in BIGINT; regenerate shallower on the rare blowout
        if 600 * vb * 10**sc >= 9e14:
            e, _p, sc, vb = _dec_expr(g, 0)
        assert 600 * vb * 10**sc < 9e14
        fn = g.rng.random()
        scale_back = f"CAST({10**sc} AS BIGINT)"
        if fn < 0.35:
            agg = f"sum(CAST({e} AS DECIMAL(28,{sc})))"
        elif fn < 0.50:
            agg = f"sum(DISTINCT CAST({e} AS DECIMAL(28,{sc})))"
        elif fn < 0.70:
            agg = f"min(CAST({e} AS DECIMAL(28,{sc})))"
        elif fn < 0.90:
            agg = f"max(CAST({e} AS DECIMAL(28,{sc})))"
        else:
            cols.append(f"CAST(count({e}) AS BIGINT) AS e{s}")
            continue
        # integerize the aggregate (scalar-mode rule 2): the aggregate's
        # value is an integer multiple of 10^-sc, so * 10^sc then
        # round(,0) -> BIGINT is exact in both engines; the DECIMAL(28,.)
        # widening keeps DuckDB's multiply intermediate in range
        cols.append(f"CAST(round({agg} * {scale_back}, 0) AS BIGINT) AS e{s}")
    grp = _Gen(seeds[0] ^ 0xDECA).str_expr(2)[0]
    return (
        "SELECT "
        + grp
        + " AS g, "
        + ", ".join(cols)
        + " FROM ("
        + _BASE
        + ") t GROUP BY "
        + grp
        + " ORDER BY g"
    )


def run_decagg_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    return _run_and_compare(
        spark, sf_dir, build_decagg_query(seeds), seeds, "decagg"
    )


# --- fmtshim mode: the Joda<->JDK datetime format shim ----------------------
#
# functions/datetime_fmt.py translates Presto's Joda patterns
# (format_datetime/parse_datetime) to JDK DateTimeFormatter patterns and
# splices the week-based tokens Spark rejects (x/w/e) in as
# weekofyear()/ISO-weekyear/ISO-day-of-week expressions — SURVEY §2.8's
# named hard spot, and the largest semantics-drift surface with no
# dedicated fuzz mode until r12 (r11 VERDICT next-round #4).  Unlike the
# SQL-text modes this one drives the REAL shim at the DataFrame level
# (format_datetime / parse_datetime imported from the package) against
# DuckDB strftime/strptime as the oracle, over a fuzzed timestamp corpus
# that includes DST-transition instants, ISO week-year boundary days
# (Dec 28-31 / Jan 1-4 — the exact rows where the shim's weekyear CASE
# could break), leap days, the epoch, and year edges 0001/0009/0123/
# 0999/9999.
#
# SHARED token subset (probe-verified cell-identical on every edge
# timestamp): yyyy/YYYY<->%Y (both zero-pad to 4), yy<->%y, MM<->%m,
# dd<->%d, HH<->%H, mm<->%M, ss<->%S, DDD<->%j (3-pad), MMM<->%b,
# MMMM<->%B, EEE<->%a, EEEE<->%A, hh<->%I, a<->%p, and the shim's
# spliced week tokens ww<->%V, xxxx<->%G, e<->%u.  Excluded by probed
# rule: years > 9999 — JDK SignStyle.EXCEEDS_PAD prints '+10000' where
# DuckDB prints '10000' (the generator caps years at 9999, which is
# also Python datetime's exact domain); sub-second fields (corpus is
# second-granularity); Sunday-based week numbers (unsupported by the
# shim itself, ValueError-pinned in test_datetime_fmt.py).  Literal
# runs (incl. letter runs that need Joda quoting) are fuzzed between
# tokens.  ~30% of seeds emit a PARSE ROUNDTRIP sentinel instead:
# parse_datetime(format_datetime(ts, p), p) == ts as 0/1 on the Spark
# side vs strptime(strftime(ts, f), f) = ts in DuckDB, over a
# full-field numeric pattern with fuzzed separators — the parse
# direction of the shim under the same corpus.

_FMTSHIM_TOKENS = (
    ("yyyy", "%Y"), ("YYYY", "%Y"), ("yy", "%y"), ("MM", "%m"),
    ("dd", "%d"), ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
    ("DDD", "%j"), ("MMM", "%b"), ("MMMM", "%B"), ("EEE", "%a"),
    ("EEEE", "%A"), ("hh", "%I"), ("a", "%p"),
    ("ww", "%V"), ("xxxx", "%G"), ("e", "%u"),
)
# literal runs: strftime passes non-% text through; Joda needs letter
# runs quoted (datetime_fmt handles quotes in both directions)
_FMTSHIM_LITERALS = ("-", " ", ":", "/", ".", ", ", "'T'", "' wk '", "' at '")

_FMTSHIM_EDGE_TS = (
    "0001-01-01 00:00:00", "0009-01-02 03:04:05", "0123-04-05 06:07:08",
    "0999-12-31 23:59:59", "1000-01-01 00:00:00", "1970-01-01 00:00:00",
    "1900-02-28 12:00:00", "2000-02-29 23:59:59", "9999-12-31 23:59:59",
    # DST transitions (US spring/fall, EU spring/fall) — the session TZ
    # is UTC so these must format structurally, and the fuzz proves it
    "2021-03-14 02:30:00", "2021-11-07 01:30:00",
    "2021-03-28 02:30:00", "2021-10-31 02:30:00",
    # ISO week-year boundaries: days whose ISO weekyear != calendar year
    "2021-01-01 06:00:00", "2021-01-03 23:59:59", "2021-01-04 00:00:00",
    "2020-12-31 12:00:00", "2024-12-30 23:59:59", "2026-01-04 12:00:00",
    "2015-12-28 00:00:00", "2016-01-03 18:30:00", "1999-01-01 00:00:01",
    "2000-01-02 02:03:04", "1982-01-01 11:11:11", "1977-01-02 22:22:22",
)


def _fmtshim_timestamps(seed: int) -> "list[str]":
    """The edge corpus + 15 seeded random timestamps (years 1-9999)."""
    import datetime as _dt
    import random as _random

    r = _random.Random(seed ^ 0xF317)
    out = list(_FMTSHIM_EDGE_TS)
    for _ in range(15):
        y = r.choice((r.randint(1, 999), r.randint(1000, 9999)))
        m = r.randint(1, 12)
        # valid day via datetime (month lengths + leap rules exactly)
        d = r.randint(1, 28) if m == 2 else r.randint(1, 30 if m in (4, 6, 9, 11) else 31)
        ts = _dt.datetime(y, m, d, r.randint(0, 23), r.randint(0, 59), r.randint(0, 59))
        out.append(ts.strftime("%Y-%m-%d %H:%M:%S").zfill(19))
    return out


def _fmtshim_pattern(r) -> "tuple[str, str]":
    """A fuzzed (joda, strftime) pattern pair from the shared subset."""
    joda: list[str] = []
    strf: list[str] = []
    for i in range(r.randint(2, 6)):
        j, s = r.choice(_FMTSHIM_TOKENS)
        # a separator is optional EXCEPT when two pattern-letter runs
        # would merge into one over-long field (MMMM+MMMM = 8 M's, which
        # JDK rejects) — same-letter adjacency always gets one, compared
        # case-INSENSITIVELY because the shim maps Joda Y to JDK y
        # (YYYY+yyyy would merge AFTER translation)
        if i and (r.random() < 0.8 or joda[-1][-1].lower() == j[0].lower()):
            lit = r.choice(_FMTSHIM_LITERALS)
            joda.append(lit)
            strf.append(lit.strip("'"))
        joda.append(j)
        strf.append(s)
    return "".join(joda), "".join(strf)


def _fmtshim_roundtrip_pattern(r) -> "tuple[str, str]":
    """Full-field numeric pattern (uniquely determines the timestamp)
    with fuzzed separators — the parse-direction grammar."""
    seps = [r.choice(("-", "/", ".", " ")) for _ in range(2)]
    seps += [r.choice((" ", "'T'", " . "))]
    seps += [r.choice((":", ".", "-")) for _ in range(2)]
    joda = (
        f"yyyy{seps[0]}MM{seps[1]}dd{seps[2]}HH{seps[3]}mm{seps[4]}ss"
    )
    strf = joda.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d") \
               .replace("HH", "%H").replace("mm", "%M").replace("ss", "%S") \
               .replace("'T'", "T").replace(" . ", " . ")
    return joda, strf


def run_fmtshim_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    import random as _random

    from pyspark.sql import functions as F

    from sensql_presto_spark.functions import datetime_fmt as dtf
    from sensql_presto_spark.testing import duckdb_connection

    ts_list = _fmtshim_timestamps(seeds[0])
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "id int, s string"
    ).select("id", F.col("s").cast("timestamp").alias("ts"))

    scols = [F.col("id")]
    dcols = ["id"]
    for s in seeds:
        r = _random.Random(s)
        if r.random() < 0.30:
            joda, strf = _fmtshim_roundtrip_pattern(r)
            scols.append(
                (
                    dtf.parse_datetime(dtf.format_datetime(F.col("ts"), joda), joda)
                    == F.col("ts")
                )
                .cast("int")
                .cast("string")
                .alias(f"e{s}")
            )
            dcols.append(
                f"CAST(CASE WHEN strptime(strftime(ts, '{strf}'), '{strf}') = ts "
                f"THEN 1 ELSE 0 END AS VARCHAR) AS e{s}"
            )
        else:
            joda, strf = _fmtshim_pattern(r)
            scols.append(dtf.format_datetime(F.col("ts"), joda).alias(f"e{s}"))
            dcols.append(f"strftime(ts, '{strf}') AS e{s}")

    actual = sdf.select(*scols).orderBy("id").toPandas()
    values = ", ".join(
        f"({i}, TIMESTAMP '{t}')" for i, t in enumerate(ts_list)
    )
    con = duckdb_connection(sf_dir)
    expected = con.sql(
        "SELECT " + ", ".join(dcols)
        + f" FROM (VALUES {values}) t(id, ts) ORDER BY id"
    ).df()
    con.close()

    problems: list[str] = []
    if len(actual) != len(expected):
        return [
            f"fmtshim: row count differs: spark={len(actual)} duckdb={len(expected)}"
        ]
    for s in seeds:
        col = f"e{s}"
        av, ev = actual[col].astype(str), expected[col].astype(str)
        eq = (av == ev) | (actual[col].isna() & expected[col].isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"fmtshim seed {s}: ts={ts_list[i]} spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems


# --- hof mode: higher-order collection functions across dialects -------------
#
# Spark's lambda HOFs (transform/filter/aggregate/exists) against DuckDB's
# list_* lambda family — the collection surface the similarity/text operators
# lean on (F.transform/F.filter/F.aggregate pipelines) had no dedicated
# differential mode.  Unlike negdiv's two-pass rendering, one generator pass
# emits BOTH dialect spellings per node, so the rng stream cannot desync.
#
# Probed divergences the grammar encodes as rules (DuckDB 1.0.0 / Spark 4):
#
#   * sequence(1, 0) DESCENDS in Spark ([1, 0]) while generate_series(1, 0)
#     is empty in DuckDB — ramp stops are always generated >= 1 via
#     1 + abs(e) % 6, so every ramp ascends in both engines;
#   * empty-array sum: Spark's aggregate() returns the init (0) while
#     DuckDB's list_aggregate(.., 'sum') returns NULL — the DuckDB side is
#     always wrapped in COALESCE(.., 0);
#   * list_distinct element order is UNSPECIFIED in DuckDB (array_distinct
#     preserves first-occurrence order in Spark) — distinct is only generated
#     composed with an outer sort;
#   * slice(A, s, L) maps to list_slice(A, s, s + L - 1): both return [] for
#     out-of-range starts (probed: slice([1,2,3], 5, 2) = [] and
#     list_slice([1,2,3], 5, 6) = []) and for L = 0 (end < begin in DuckDB);
#   * element_at out-of-bounds RAISES under ANSI Spark while DuckDB's A[i]
#     returns NULL — element_at is generated only over arrays whose
#     nonemptiness is guaranteed by construction (a ramp base reached by no
#     filter/slice), with the index folded into range via 1 + abs(e) % size;
#   * array_max/array_min of an empty array is NULL in both engines, but the
#     columns compare through COALESCE(.., -9999) so a filter-to-empty row
#     still compares a concrete value;
#   * % inside lambda bodies is C-style (sign of the dividend) in BOTH
#     engines (probed: list_transform([-3,-2], x -> x % 2) = [-1, 0]), same
#     as the negdiv mode's top-level contract;
#   * empty-array join: Spark's array_join([]) is '' while DuckDB's
#     array_to_string([]) is NULL (FOUND LIVE by this mode's first 200-seed
#     smoke, seeds 187423/187446/187515/187528/187552/187560) — the DuckDB
#     fingerprint column is wrapped in COALESCE(.., '').
#
# Magnitudes are tracked exactly as in int_expr: ramp elements <= 7, literal
# elements reuse int_expr(1) bounds, lambda multipliers <= 9, so any sum over
# a <= ~40-element array stays orders of magnitude below int64.


def _hof_lambda_body(g: "_Gen", mag: float) -> tuple[str, float]:
    """Integer lambda body over ``x`` — identical spelling in both dialects."""
    r = g.rng
    pick = r.random()
    if pick < 0.18:
        return "x", mag
    if pick < 0.38:
        k = r.randint(-99, 99)
        return f"(x + {k})", mag + abs(k)
    if pick < 0.53:
        k = r.randint(2, 9)
        return f"(x * {k})", mag * k
    if pick < 0.68:
        k = r.randint(2, 9)
        return f"abs(x - {k})", mag + k
    if pick < 0.86:
        k = r.randint(2, 9)
        return f"(x % {k})", float(k)
    k = r.randint(2, 9)
    j = r.randint(0, k - 1)
    a = r.randint(-99, 99)
    return f"(CASE WHEN x % {k} = {j} THEN {a} ELSE x END)", mag + abs(a)


def _hof_pred(g: "_Gen", mag: float) -> str:
    """Boolean lambda body over ``x`` — identical spelling in both dialects."""
    r = g.rng
    pick = r.random()
    if pick < 0.4:
        k = r.randint(2, 9)
        return f"(x % {k} = {r.randint(0, k - 1)})"
    if pick < 0.7:
        return f"(x > {r.randint(-9, 9)})"
    return f"(x <> {r.randint(-5, 9)})"


def _hof_arr(g: "_Gen", depth: int) -> tuple[str, str, float, bool]:
    """Returns (spark_sql, duckdb_sql, elem_magnitude, nonempty_guaranteed)."""
    r = g.rng
    if depth <= 0:
        if r.random() < 0.5:
            e, _ = g.int_expr(0)
            n = f"(1 + abs({e}) % 6)"
            return f"sequence(1, {n})", f"generate_series(1, {n})", 7.0, True
        elems = [g.int_expr(1) for _ in range(r.randint(1, 4))]
        lst = ", ".join(e for e, _ in elems)
        mag = max(m for _, m in elems)
        return f"array({lst})", f"[{lst}]", mag, True
    s, d, mag, ne = _hof_arr(g, depth - 1)
    pick = r.random()
    if pick < 0.22:
        body, bmag = _hof_lambda_body(g, mag)
        return f"transform({s}, x -> {body})", f"list_transform({d}, x -> {body})", bmag, ne
    if pick < 0.40:
        p = _hof_pred(g, mag)
        return f"filter({s}, x -> {p})", f"list_filter({d}, x -> {p})", mag, False
    if pick < 0.52:
        if r.random() < 0.5:
            return f"sort_array({s})", f"list_sort({d})", mag, ne
        return f"sort_array({s}, false)", f"list_sort({d}, 'DESC')", mag, ne
    if pick < 0.62:
        return (
            f"sort_array(array_distinct({s}))",
            f"list_sort(list_distinct({d}))",
            mag,
            ne,
        )
    if pick < 0.72:
        return f"reverse({s})", f"list_reverse({d})", mag, ne
    if pick < 0.86:
        s2, d2, mag2, ne2 = _hof_arr(g, depth - 1)
        return f"concat({s}, {s2})", f"list_concat({d}, {d2})", max(mag, mag2), ne or ne2
    start, ln = r.randint(1, 4), r.randint(0, 4)
    return f"slice({s}, {start}, {ln})", f"list_slice({d}, {start}, {start + ln - 1})", mag, False


def _hof_col(g: "_Gen") -> tuple[str, str]:
    r = g.rng
    s, d, mag, ne = _hof_arr(g, r.randint(1, 3))
    pick = r.random()
    if pick < 0.20:
        return (
            f"CAST(aggregate({s}, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)",
            f"CAST(COALESCE(list_aggregate({d}, 'sum'), 0) AS BIGINT)",
        )
    if pick < 0.38:
        return f"CAST(size({s}) AS BIGINT)", f"CAST(len({d}) AS BIGINT)"
    if pick < 0.50:
        return (
            f"CAST(COALESCE(array_max({s}), -9999) AS BIGINT)",
            f"CAST(COALESCE(list_max({d}), -9999) AS BIGINT)",
        )
    if pick < 0.60:
        return (
            f"CAST(COALESCE(array_min({s}), -9999) AS BIGINT)",
            f"CAST(COALESCE(list_min({d}), -9999) AS BIGINT)",
        )
    if pick < 0.72:
        k, _ = g.int_expr(1)
        return (
            f"(CASE WHEN array_contains(transform({s}, x -> CAST(x AS BIGINT)), CAST({k} AS BIGINT)) THEN 1 ELSE 0 END)",
            f"(CASE WHEN list_contains({d}, {k}) THEN 1 ELSE 0 END)",
        )
    if pick < 0.84:
        p = _hof_pred(g, mag)
        return (
            f"(CASE WHEN exists({s}, x -> {p}) THEN 1 ELSE 0 END)",
            f"(CASE WHEN len(list_filter({d}, x -> {p})) > 0 THEN 1 ELSE 0 END)",
        )
    if ne:
        e, _ = g.int_expr(0)
        return (
            # Spark's element_at requires an INT index (the modulo keeps it
            # tiny, so the narrowing cast is always in range)
            f"CAST(element_at({s}, CAST(1 + abs({e}) % size({s}) AS INT)) AS BIGINT)",
            f"CAST({d}[1 + abs({e}) % len({d})] AS BIGINT)",
        )
    return (
        f"array_join(transform({s}, x -> CAST(x AS STRING)), ',')",
        f"COALESCE(array_to_string({d}, ','), '')",
    )


def build_hof_query(seeds: list[int], dialect: str) -> str:
    cols = []
    for s in seeds:
        sp, du = _hof_col(_Gen(s))
        cols.append(f"{sp if dialect == 'spark' else du} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ",\n       ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_hof_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    from sensql_presto_spark import catalog
    from sensql_presto_spark.testing import duckdb_connection

    actual = catalog.sql(spark, sf_dir, build_hof_query(seeds, "spark")).toPandas()
    con = duckdb_connection(sf_dir)
    expected = con.sql(build_hof_query(seeds, "duckdb")).df()
    con.close()
    problems = []
    if len(actual) != len(expected):
        return [f"hof: row count differs: spark={len(actual)} duckdb={len(expected)}"]
    for s in seeds:
        col = f"e{s}"
        av, ev = actual[col], expected[col]
        eq = (av == ev) | (av.isna() & ev.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"hof seed {s}: row {i} spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems


# --- hofmap mode: map construction/lookup across dialects --------------------
#
# Companion to the hof mode for the MAP surface (fn_map's operators ride
# it): Spark map_from_arrays/element_at/try_element_at/cardinality/
# map_keys/map_values against DuckDB's map()/bracket-extraction family.
# A SEPARATE mode (not a hof grammar branch) so the hof CI pins keep
# generating byte-identical expressions — extending a seeded grammar
# shifts every rng draw after the first new branch.
#
# Probed rules (DuckDB 1.0.0 / this repo's Spark session):
#
#   * DuckDB map extraction m[k] returns a LIST of matches ([10], [] for
#     a miss) — every lookup unwraps with [1], which maps empty to NULL;
#   * maps are built ONLY as map(ramp, transform(ramp, body)): the ramp's
#     1..n keys are distinct by construction (duplicate keys RAISE in
#     both engines) and both sides always zip equal-length arrays;
#   * missing-key lookup is NULL on both sides here (Spark
#     try_element_at — explicit even though this session's element_at
#     also returns NULL with ANSI off — vs the [] -> NULL unwrap),
#     compared through COALESCE(.., -7777);
#   * key/value order: both engines preserve the construction order of
#     map_from_arrays/map(), so keys/values fingerprints compare without
#     a sort (ramp keys are ascending anyway).


def _hofmap_col(g: "_Gen") -> tuple[str, str]:
    r = g.rng
    e, _ = g.int_expr(0)
    n = f"(1 + abs({e}) % 6)"
    body, _ = _hof_lambda_body(g, 7.0)
    sk, dk = f"sequence(1, {n})", f"generate_series(1, {n})"
    sm = f"map_from_arrays({sk}, transform({sk}, x -> {body}))"
    dm = f"map({dk}, list_transform({dk}, x -> {body}))"
    pick = r.random()
    if pick < 0.25:
        e2, _ = g.int_expr(0)
        idx = f"(1 + abs({e2}) % {n})"
        return (
            f"CAST(element_at({sm}, {idx}) AS BIGINT)",
            f"CAST(({dm}[{idx}])[1] AS BIGINT)",
        )
    if pick < 0.50:
        e2, _ = g.int_expr(0)
        idx = f"(1 + abs({e2}) % ({n} + 3))"
        return (
            f"CAST(COALESCE(try_element_at({sm}, {idx}), -7777) AS BIGINT)",
            f"CAST(COALESCE(({dm}[{idx}])[1], -7777) AS BIGINT)",
        )
    if pick < 0.65:
        return (
            f"CAST(cardinality({sm}) AS BIGINT)",
            f"CAST(cardinality({dm}) AS BIGINT)",
        )
    if pick < 0.85:
        return (
            f"CAST(aggregate(map_values({sm}), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)",
            f"CAST(COALESCE(list_aggregate(map_values({dm}), 'sum'), 0) AS BIGINT)",
        )
    return (
        f"array_join(transform(map_keys({sm}), x -> CAST(x AS STRING)), ',')",
        f"COALESCE(array_to_string(map_keys({dm}), ','), '')",
    )


def build_hofmap_query(seeds: list[int], dialect: str) -> str:
    cols = []
    for s in seeds:
        sp, du = _hofmap_col(_Gen(s))
        cols.append(f"{sp if dialect == 'spark' else du} AS e{s}")
    return (
        "SELECT o_orderkey, "
        + ",\n       ".join(cols)
        + " FROM ("
        + _BASE
        + ") t ORDER BY o_orderkey"
    )


def run_hofmap_batch(spark, sf_dir: str, seeds: list[int]) -> list[str]:
    from sensql_presto_spark import catalog
    from sensql_presto_spark.testing import duckdb_connection

    actual = catalog.sql(spark, sf_dir, build_hofmap_query(seeds, "spark")).toPandas()
    con = duckdb_connection(sf_dir)
    expected = con.sql(build_hofmap_query(seeds, "duckdb")).df()
    con.close()
    problems = []
    if len(actual) != len(expected):
        return [f"hofmap: row count differs: spark={len(actual)} duckdb={len(expected)}"]
    for s in seeds:
        col = f"e{s}"
        av, ev = actual[col], expected[col]
        eq = (av == ev) | (av.isna() & ev.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            problems.append(
                f"hofmap seed {s}: row {i} spark={av[i]!r} duckdb={ev[i]!r}"
            )
    return problems
