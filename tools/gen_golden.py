"""Generate golden-corpus fixtures (tests/golden/<group>/<name>.{sql,result}).

Each case carries the Spark SQL (what the test runs via catalog.sql) and
either a DuckDB SQL used to generate the expected rows independently, or
hand-derived rows for Spark-specific scalar functions evaluated over
literals (where the expected output is checkable by inspection).
"""

from __future__ import annotations

import os

import duckdb

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _fmt(v, typ):
    if v is None:
        return "NULL"
    if typ == "BOOLEAN":
        return "true" if v else "false"
    if typ in ("DOUBLE", "REAL"):
        return repr(float(v))
    return str(v)


def emit(group, name, spark_sql, types, duck_sql=None, rows=None, tables="nation"):
    os.makedirs(os.path.join(OUT, group), exist_ok=True)
    sql_path = os.path.join(OUT, group, f"{name}.sql")
    res_path = os.path.join(OUT, group, f"{name}.result")
    with open(sql_path, "w") as f:
        f.write(f"-- database: spark; tables: {tables}; groups: {group};\n")
        f.write(spark_sql.strip() + "\n")
    if rows is None:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        rows = con.sql(duck_sql or spark_sql).fetchall()
        con.close()
    with open(res_path, "w") as f:
        f.write(f"-- delimiter: |; types: {'|'.join(types)}\n")
        for row in rows:
            f.write("|".join(_fmt(v, t) for v, t in zip(row, types)) + "\n")
    print(f"{group}/{name}: {len(rows)} rows")


# --- horology (reference: sql-tests/testcases/horology-ish datetime cases) ---
emit(
    "horology",
    "trunc_extract",
    """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS month_start,
       year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       month(o_orderdate) AS m, day(o_orderdate) AS d
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
""",
    ["BIGINT", "TIMESTAMP", "BIGINT", "BIGINT", "BIGINT", "BIGINT"],
    tables="orders",
)

emit(
    "horology",
    "date_arith",
    """
SELECT o_orderkey,
       date_add(cast(o_orderdate AS DATE), 30) AS plus30,
       last_day(o_orderdate) AS eom
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
""",
    ["BIGINT", "DATE", "DATE"],
    duck_sql="""
SELECT o_orderkey,
       cast(o_orderdate AS DATE) + 30 AS plus30,
       last_day(cast(o_orderdate AS DATE)) AS eom
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
""",
    tables="orders",
)

# --- url functions (Spark parse_url; expected derived by hand) --------------
emit(
    "url_functions",
    "parse_components",
    """
SELECT u,
       parse_url(u, 'HOST') AS host,
       parse_url(u, 'PATH') AS path,
       parse_url(u, 'QUERY') AS query,
       parse_url(u, 'QUERY', 'q') AS q_param,
       parse_url(u, 'PROTOCOL') AS protocol
FROM VALUES ('http://example.com:8080/docs/a.html?q=spark&x=1'),
            ('https://user@sub.host.org/p/q'),
            ('ftp://files.net/pub') AS t(u)
ORDER BY u
""",
    ["VARCHAR"] * 6,
    rows=[
        (
            "ftp://files.net/pub",
            "files.net",
            "/pub",
            None,
            None,
            "ftp",
        ),
        (
            "http://example.com:8080/docs/a.html?q=spark&x=1",
            "example.com",
            "/docs/a.html",
            "q=spark&x=1",
            "spark",
            "http",
        ),
        (
            "https://user@sub.host.org/p/q",
            "sub.host.org",
            "/p/q",
            None,
            None,
            "https",
        ),
    ],
)

# --- json functions (Spark get_json_object/json_array_length; hand rows) ----
emit(
    "json_functions",
    "extract_scalar",
    """
SELECT j,
       get_json_object(j, '$.a') AS a,
       get_json_object(j, '$.b.c') AS bc,
       get_json_object(j, '$.arr[1]') AS arr1,
       cast(json_array_length(get_json_object(j, '$.arr')) AS INT) AS arr_len
FROM VALUES ('{"a":1,"b":{"c":"x"},"arr":[10,20,30]}'),
            ('{"a":null,"b":{},"arr":[]}') AS t(j)
ORDER BY j
""",
    ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "INTEGER"],
    rows=[
        ('{"a":1,"b":{"c":"x"},"arr":[10,20,30]}', "1", "x", "20", 3),
        ('{"a":null,"b":{},"arr":[]}', None, None, None, 0),
    ],
)

# --- binary functions (md5 via DuckDB; xxhash-free portable subset) ---------
emit(
    "binary_functions",
    "digests",
    """
SELECT n_name, md5(n_name) AS m, length(md5(n_name)) AS hexlen
FROM nation WHERE n_nationkey < 5 ORDER BY n_name
""",
    ["VARCHAR", "VARCHAR", "BIGINT"],
)

emit(
    "binary_functions",
    "base64_hex",
    """
SELECT base64('spark') AS b64, hex('OK') AS hx, cast(unbase64('c3Bhcms=') AS STRING) AS rt
FROM region WHERE r_regionkey = 0
""",
    ["VARCHAR", "VARCHAR", "VARCHAR"],
    rows=[("c3Bhcms=", "4F4B", "spark")],
    tables="region",
)

# --- array functions --------------------------------------------------------
emit(
    "array_functions",
    "hof_pipeline",
    """
SELECT size(xs) AS n,
       array_join(transform(xs, x -> x * 2), ',') AS doubled,
       array_join(filter(xs, x -> x % 2 = 0), ',') AS evens,
       aggregate(xs, 0, (acc, x) -> acc + x) AS total,
       array_max(xs) AS mx
FROM VALUES (array(3, 1, 4, 1, 5)), (array(2, 7, 1, 8)) AS t(xs)
ORDER BY n
""",
    ["INTEGER", "VARCHAR", "VARCHAR", "INTEGER", "INTEGER"],
    rows=[
        (4, "4,14,2,16", "2,8", 18, 8),
        (5, "6,2,8,2,10", "4", 14, 5),
    ],
)

# --- map functions ----------------------------------------------------------
emit(
    "map_functions",
    "construct_access",
    """
SELECT m['a'] AS va, m['b'] AS vb,
       array_join(array_sort(map_keys(m)), ',') AS ks,
       size(m) AS n
FROM VALUES (map('a', 1, 'b', 2)), (map('a', 10, 'b', 20)) AS t(m)
ORDER BY va
""",
    ["INTEGER", "INTEGER", "VARCHAR", "INTEGER"],
    rows=[(1, 2, "a,b", 2), (10, 20, "a,b", 2)],
)

# --- regex ------------------------------------------------------------------
emit(
    "regex",
    "extract_replace",
    """
SELECT n_name,
       regexp_extract(n_name, '([0-9]+)', 1) AS num,
       regexp_replace(n_name, '[0-9]+', '#') AS masked,
       n_name RLIKE '^NATION_1[0-9]$' AS teens
FROM nation WHERE n_nationkey < 15 ORDER BY n_name
""",
    ["VARCHAR", "VARCHAR", "VARCHAR", "BOOLEAN"],
    duck_sql="""
SELECT n_name,
       regexp_extract(n_name, '([0-9]+)', 1) AS num,
       regexp_replace(n_name, '[0-9]+', '#', 'g') AS masked,
       regexp_matches(n_name, '^NATION_1[0-9]$') AS teens
FROM nation WHERE n_nationkey < 15 ORDER BY n_name
""",
)

# --- conditional ------------------------------------------------------------
emit(
    "conditional",
    "case_coalesce_nullif",
    """
SELECT n_name,
       CASE WHEN n_regionkey = 0 THEN 'zero' WHEN n_regionkey < 3 THEN 'low' ELSE 'high' END AS band,
       coalesce(nullif(n_regionkey, 0), 99) AS nz,
       if(n_nationkey % 2 = 0, 'even', 'odd') AS parity
FROM nation ORDER BY n_name
""",
    ["VARCHAR", "VARCHAR", "BIGINT", "VARCHAR"],
    duck_sql="""
SELECT n_name,
       CASE WHEN n_regionkey = 0 THEN 'zero' WHEN n_regionkey < 3 THEN 'low' ELSE 'high' END AS band,
       coalesce(nullif(n_regionkey, 0), 99) AS nz,
       CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
FROM nation ORDER BY n_name
""",
)

# --- conversion / casts -----------------------------------------------------
emit(
    "conversion",
    "casts",
    """
SELECT cast(l_quantity AS BIGINT) AS qi,
       cast(cast(l_quantity AS BIGINT) AS STRING) AS qs,
       cast(cast(floor(l_extendedprice) AS INT) AS DOUBLE) AS pd,
       cast(l_shipdate AS DATE) AS sd,
       cast('42' AS INT) + 1 AS parsed
FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber
""",
    ["BIGINT", "VARCHAR", "DOUBLE", "DATE", "INTEGER"],
    duck_sql="""
SELECT cast(l_quantity AS BIGINT) AS qi,
       cast(cast(l_quantity AS BIGINT) AS VARCHAR) AS qs,
       cast(cast(floor(l_extendedprice) AS INT) AS DOUBLE) AS pd,
       cast(l_shipdate AS DATE) AS sd,
       cast('42' AS INT) + 1 AS parsed
FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber
""",
    tables="lineitem",
)

# --- subqueries -------------------------------------------------------------
emit(
    "subqueries",
    "correlated_exists_in",
    """
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
  AND n.n_nationkey IN (SELECT c_nationkey FROM customer)
ORDER BY n_name
""",
    ["VARCHAR"],
    tables="nation,customer",
)

# --- with clause ------------------------------------------------------------
emit(
    "with_clause",
    "cte_chain",
    """
WITH big AS (SELECT * FROM customer WHERE c_acctbal > 5000),
     by_nation AS (SELECT c_nationkey, count(*) AS n FROM big GROUP BY c_nationkey)
SELECT n.n_name, b.n FROM by_nation b JOIN nation n ON b.c_nationkey = n.n_nationkey
WHERE b.n >= 2 ORDER BY n.n_name
""",
    ["VARCHAR", "BIGINT"],
    tables="customer,nation",
)

# --- tpch golden (hash-stable cents formulation, sf0.001) -------------------
emit(
    "tpch",
    "q06_revenue",
    """
SELECT CAST(sum(cast(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    ["DOUBLE"],
    tables="lineitem",
)

emit(
    "tpch",
    "q01_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       sum(cast(l_quantity AS BIGINT)) AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    ["VARCHAR", "VARCHAR", "BIGINT", "BIGINT"],
    tables="lineitem",
)

# --- distinct ---------------------------------------------------------------
emit(
    "distinct",
    "distinct_projection",
    """
SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey
""",
    ["BIGINT"],
)

# --- order_by ---------------------------------------------------------------
emit(
    "order_by",
    "multi_key_nulls",
    """
SELECT n_regionkey, nullif(n_nationkey % 3, 0) AS k, n_name
FROM nation
ORDER BY n_regionkey, k ASC NULLS LAST, n_name DESC
""",
    ["BIGINT", "BIGINT", "VARCHAR"],
    duck_sql="""
SELECT n_regionkey, nullif(n_nationkey % 3, 0) AS k, n_name
FROM nation
ORDER BY n_regionkey, k ASC NULLS LAST, n_name DESC
""",
)

# --- select_no_from ---------------------------------------------------------
emit(
    "select_no_from",
    "literal_expressions",
    """
SELECT 1 + 2 AS a, 'x' || 'y' AS s, cast(null AS INT) AS n,
       greatest(3, 1, 2) AS g, power(2, 10) AS p
""",
    ["INTEGER", "VARCHAR", "INTEGER", "INTEGER", "DOUBLE"],
    rows=[(3, "xy", None, 3, 1024.0)],
    tables="",
)

# --- union (reference keeps it separate from set_operation) -----------------
emit(
    "union",
    "union_vs_union_all",
    """
SELECT x, cnt FROM (
    SELECT 'dedup' AS x, count(*) AS cnt FROM (
        SELECT n_regionkey FROM nation UNION SELECT r_regionkey FROM region)
    UNION ALL
    SELECT 'all' AS x, count(*) AS cnt FROM (
        SELECT n_regionkey FROM nation UNION ALL SELECT r_regionkey FROM region)
) ORDER BY x
""",
    ["VARCHAR", "BIGINT"],
    tables="nation,region",
)

# --- functions (general sampler, reference's catch-all group) ---------------
emit(
    "functions",
    "mixed_sampler",
    """
SELECT abs(-5) AS a, length('spark') AS l, upper('ok') AS u,
       coalesce(NULL, 'fb') AS c, round(2.5) AS r, trunc(cast('2024-02-14' AS DATE), 'MM') AS t
""",
    ["INTEGER", "INTEGER", "VARCHAR", "VARCHAR", "BIGINT", "DATE"],
    rows=[(5, 5, "OK", "fb", 3, "2024-02-01")],
    tables="",
)

# --- empty result set (header-only .result; parser edge case) ---------------
emit(
    "empty_table",
    "empty_result",
    """
SELECT n_name FROM nation WHERE n_nationkey < 0 ORDER BY n_name
""",
    ["VARCHAR"],
)

# --- tpcds goldens (reference: sql-tests/testcases/tpcds/q01.sql|.result);
#     the .sql text and oracle come straight from the registry pair -------
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sensql_presto_spark.queries import all_specs  # noqa: E402

_specs = all_specs()
for _q, _name, _types in (
    ("tpcds_q03", "q03_brand_revenue", ["BIGINT", "VARCHAR", "BIGINT"]),
    ("tpcds_q52", "q52_brand_ext_price", ["BIGINT", "VARCHAR", "BIGINT"]),
):
    _spec = _specs[_q]
    _spark_sql = _spec.build.__defaults__[0]  # _sql_query stores the text here
    emit("tpcds", _name, _spark_sql, _types, duck_sql=_spec.oracle,
         tables="lineitem,orders,part")

# --- catalog (reference group: SHOW TABLES over the registered catalog) -----
emit(
    "catalog",
    "show_tables",
    """
SHOW TABLES LIKE 'customer|documents|embeddings|events|lineitem|nation|orders|part|region|supplier'
""",
    ["VARCHAR", "VARCHAR", "BOOLEAN"],
    rows=[
        ("", t, True)
        for t in ("customer", "documents", "embeddings", "events", "lineitem",
                  "nation", "orders", "part", "region", "supplier")
    ],
    tables="",
)

# --- round-3 additions: semantics worth locking as goldens ------------------

# grouping_id / GROUPING() arithmetic over CUBE (GroupIdOperator parity)
emit(
    "group-by",
    "grouping_id_cube",
    """
SELECT r_name, n_regionkey,
       cast(grouping(r_name) AS INT) AS g_r,
       cast(grouping(n_regionkey) AS INT) AS g_n,
       cast(grouping_id(r_name, n_regionkey) AS INT) AS gid,
       count(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, n_regionkey)
ORDER BY gid, r_name NULLS FIRST, n_regionkey NULLS FIRST
""",
    ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER", "BIGINT"],
    duck_sql="""
SELECT r_name, n_regionkey,
       cast(grouping(r_name) AS INT) AS g_r,
       cast(grouping(n_regionkey) AS INT) AS g_n,
       cast(grouping(r_name) * 2 + grouping(n_regionkey) AS INT) AS gid,
       count(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, n_regionkey)
ORDER BY gid, r_name NULLS FIRST, n_regionkey NULLS FIRST
""",
    tables="nation,region",
)

# RANGE BETWEEN INTERVAL frame over timestamps (WindowFrame RANGE parity)
emit(
    "window_functions",
    "range_interval_frame",
    """
SELECT o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
           AS n_last_90d
FROM orders WHERE o_custkey <= 20
ORDER BY o_orderkey
""",
    ["BIGINT", "BIGINT"],
    duck_sql="""
SELECT o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
           AS n_last_90d
FROM orders WHERE o_custkey <= 20
ORDER BY o_orderkey
""",
    tables="orders",
)

# try_* arithmetic: NULL on overflow/bad input instead of ANSI error
emit(
    "math_functions",
    "try_arithmetic",
    """
SELECT try_add(9223372036854775807, 1) AS add_ovf,
       try_multiply(9223372036854775807, 2) AS mul_ovf,
       try_divide(1, 0) AS div0,
       try_add(1, 2) AS ok_add,
       try_to_number('abc', '999') AS bad_num
""",
    ["BIGINT", "BIGINT", "DOUBLE", "BIGINT", "DECIMAL"],
    rows=[(None, None, None, 3, None)],
    tables="",
)

# map higher-order functions (transform_keys/transform_values/map_zip_with)
emit(
    "map_functions",
    "map_higher_order",
    """
SELECT cast(map_entries(transform_keys(map('a', 1, 'b', 2), (k, v) -> upper(k))) AS STRING) AS upper_keys,
       cast(map_entries(transform_values(map('a', 1, 'b', 2), (k, v) -> v * 10)) AS STRING) AS v10,
       cast(map_entries(map_zip_with(map('a', 1, 'b', 2), map('a', 10, 'c', 30),
                                (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))) AS STRING) AS zipped
""",
    ["VARCHAR", "VARCHAR", "VARCHAR"],
    rows=[
        (
            "[{A, 1}, {B, 2}]",
            "[{a, 10}, {b, 20}]",
            "[{a, 11}, {b, 2}, {c, 30}]",
        )
    ],
    tables="",
)

# generator expressions: stack() and posexplode_outer() incl. empty input
emit(
    "select_no_from",
    "generators",
    """
SELECT s.col0 AS k, s.col1 AS v
FROM (SELECT stack(3, 'a', 1, 'b', 2, 'c', 3)) s
ORDER BY k
""",
    ["VARCHAR", "INTEGER"],
    rows=[("a", 1), ("b", 2), ("c", 3)],
    tables="",
)

emit(
    "array_functions",
    "posexplode_outer_null",
    """
SELECT id, pos, val
FROM (SELECT 1 AS id, array('x', 'y') AS a
      UNION ALL SELECT 2, array()
      UNION ALL SELECT 3, NULL)
LATERAL VIEW OUTER posexplode(a) AS pos, val
ORDER BY id, pos
""",
    ["INTEGER", "INTEGER", "VARCHAR"],
    rows=[(1, 0, "x"), (1, 1, "y"), (2, None, None), (3, None, None)],
    tables="",
)

# bitmap-style integer bit functions
emit(
    "math_functions",
    "bit_probe",
    """
SELECT bit_count(255) AS c255, bit_count(-1) AS cneg,
       getbit(5, 0) AS b0, getbit(5, 1) AS b1, getbit(5, 2) AS b2
""",
    ["INTEGER", "INTEGER", "TINYINT", "TINYINT", "TINYINT"],
    rows=[(8, 64, 1, 0, 1)],
    tables="",
)

# make_timestamp / weekday / dayofweek trio (dialect-split dow conventions)
emit(
    "horology",
    "make_ts_weekday",
    """
SELECT make_timestamp(1995, 3, 14, 1, 59, 26.535897) AS ts,
       weekday(DATE '1995-03-14') AS wd_mon0,
       dayofweek(DATE '1995-03-14') AS dow_sun1
""",
    ["TIMESTAMP", "INTEGER", "INTEGER"],
    rows=[("1995-03-14 01:59:26.535897", 1, 3)],
    tables="",
)

# --- round-3-final compat tranche (requires register_all — the golden
#     runner registers the compat layer module-scoped). ISO date parts,
#     array_frequency/duplicates, split_to_map, json_size over literals;
#     expected rows hand-derived (checkable by inspection) or via DuckDB
#     equivalents.
emit(
    "presto_compat",
    "iso_date_parts",
    """
SELECT day_of_week(DATE '2026-08-16') AS dw_sun,
       dow(DATE '2026-08-10') AS dw_mon,
       day_of_year(DATE '2026-02-01') AS doy,
       week(DATE '2021-01-01') AS w53,
       year_of_week(DATE '2021-01-01') AS yow2020,
       yow(DATE '2026-08-14') AS yow2026
""",
    ["BIGINT", "BIGINT", "BIGINT", "BIGINT", "BIGINT", "BIGINT"],
    rows=[(7, 1, 32, 53, 2020, 2026)],
    tables="",
)

emit(
    "presto_compat",
    "array_dup_freq",
    """
SELECT array_join(array_duplicates(array('a', 'b', 'a', 'c', 'b')), ',') AS dups,
       array_join(array_dupes(array('x', 'x', 'y')), ',') AS dupes_alias,
       size(array_duplicates(array('p', 'q'))) AS none_dup,
       array_frequency(array('a', 'b', 'a'))['a'] AS freq_a,
       array_frequency(array('a', 'b', 'a'))['b'] AS freq_b
""",
    ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER", "INTEGER"],
    rows=[("a,b", "x", 0, 2, 1)],
    tables="",
)

emit(
    "presto_compat",
    "split_to_map_json_size",
    """
SELECT split_to_map('a=1,b=2', ',', '=')['a'] AS va,
       split_to_map('k.x:1|k.y:2', '|', ':')['k.y'] AS vy,
       json_size('{"a": {"b": [1,2,3]}}', '$.a') AS obj_size,
       json_size('{"a": {"b": [1,2,3]}}', '$.a.b') AS arr_size,
       json_size('{"a": 7}', '$.a') AS scalar_size,
       json_extract('{"a": [5,6]}', '$.a[1]') AS second
""",
    ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER", "INTEGER", "VARCHAR"],
    rows=[("1", "2", 1, 3, 0, "6")],
    tables="",
)
