"""Scalar-function coverage (SURVEY.md §2.8) as oracle-checked queries.

One query per function family from the reference's registry
(``BuiltInTypeAndFunctionNamespaceManager.java:596-897``); each exercises the
Spark builtins (JVM-side, codegen'd — never Python UDFs here) against a
DuckDB oracle written in DuckDB's own dialect. Cross-dialect notes are
inline where semantics differ (dayofweek base, regexp_replace global flag,
xor operator, sequence bounds).
"""

from __future__ import annotations

from sensql_presto_spark.queries.registry import register
from sensql_presto_spark.queries.relational import _sql_query

# --- strings (StringFunctions.java, 44 fns) ---------------------------------

_sql_query(
    "fn_string_basic",
    """
    SELECT c_custkey,
           length(c_name) AS name_len,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           substr(c_name, 10, 5) AS sub5,
           lpad(c_mktsegment, 12, '*') AS lp,
           rpad(c_mktsegment, 12, '.') AS rp,
           reverse(c_mktsegment) AS rev,
           replace(c_name, 'Customer#', 'C') AS repl,
           split_part(c_name, '#', 2) AS num_part,
           instr(c_name, '#') AS hash_pos,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           left(c_name, 4) AS l4,
           right(c_name, 3) AS r3,
           repeat('ab', 3) AS rep,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           startswith(c_name, 'Customer') AS sw,
           endswith(c_name, '1') AS ew
    FROM customer WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    oracle="""
    SELECT c_custkey,
           length(c_name) AS name_len,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           substr(c_name, 10, 5) AS sub5,
           lpad(c_mktsegment, 12, '*') AS lp,
           rpad(c_mktsegment, 12, '.') AS rp,
           reverse(c_mktsegment) AS rev,
           replace(c_name, 'Customer#', 'C') AS repl,
           split_part(c_name, '#', 2) AS num_part,
           strpos(c_name, '#') AS hash_pos,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           left(c_name, 4) AS l4,
           right(c_name, 3) AS r3,
           repeat('ab', 3) AS rep,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           starts_with(c_name, 'Customer') AS sw,
           ends_with(c_name, '1') AS ew
    FROM customer WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    tags=("functions", "string"),
)

_sql_query(
    "fn_string_distance",
    """
    SELECT p_partkey,
           initcap(p_name) AS title_name,
           levenshtein(p_name, 'small ring') AS lev,
           ascii(p_name) AS first_cp,
           char(65 + CAST(p_partkey % 26 AS INT)) AS letter
    FROM part WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
                           w -> upper(w[1]) || lower(w[2:])), ' ') AS title_name,
           levenshtein(p_name, 'small ring') AS lev,
           ascii(p_name) AS first_cp,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter
    FROM part WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    tags=("functions", "string"),
)

# --- regex (JoniRegexpFunctions.java) ----------------------------------------

_sql_query(
    "fn_regex",
    """
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '0+', '') AS no_zeros,
           c_name RLIKE '[13579]$' AS odd_tail,
           regexp_count(c_name, '0') AS zero_count,
           regexp_extract_all(c_name, '[0-9]', 0)[0] AS first_digit
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '0+', '', 'g') AS no_zeros,
           regexp_matches(c_name, '[13579]$') AS odd_tail,
           len(regexp_extract_all(c_name, '0')) AS zero_count,
           regexp_extract_all(c_name, '[0-9]')[1] AS first_digit
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
    tags=("functions", "regex"),
)

# --- datetime (DateTimeFunctions.java, 95 fns) -------------------------------

_sql_query(
    "fn_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS wk,
           dayofyear(o_orderdate) AS doy,
           dayofweek(o_orderdate) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           datediff(TIMESTAMP '1998-01-01', o_orderdate) AS days_to_98,
           unix_timestamp(o_orderdate) AS epoch_s,
           date_format(o_orderdate, 'yyyy-MM') AS ym
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           week(o_orderdate) AS wk,
           dayofyear(o_orderdate) AS doy,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("functions", "datetime"),
    doc="dayofweek: Spark 1=Sunday, DuckDB 0=Sunday (oracle adds 1).",
)

# --- math (MathFunctions.java, 110 fns) --------------------------------------

# Transcendentals are rounded to 6 decimals: JVM libm and DuckDB's libm can
# disagree in the last ulp per row (no accumulation involved), which is
# exactly the drift round-1's hash mismatch showed. sqrt is IEEE
# correctly-rounded (identical in both) but rounded anyway for uniformity.
_FN_MATH_SQL = """
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS absd,
           CAST(ceil(l_discount * 100) AS BIGINT) AS c100,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS kprice,
           round(l_extendedprice, 1) AS r1,
           round(sqrt(l_quantity), 6) AS sq,
           round(cbrt(l_quantity), 6) AS cb,
           round(exp(l_discount), 6) AS ex,
           round(ln(l_extendedprice), 6) AS lnp,
           round(log10(l_extendedprice), 6) AS lg10,
           round(log2(l_quantity), 6) AS lg2,
           power(l_quantity, 2) AS p2,
           mod(l_linenumber, 3) AS m3,
           CAST(sign(l_quantity - 25) AS BIGINT) AS sg,
           greatest(l_quantity, l_linenumber * 10) AS gr,
           least(l_quantity, l_linenumber * 10) AS le,
           round(atan2(l_quantity, 3), 6) AS at2,
           round(sin(l_discount), 6) AS sn,
           round(degrees(l_discount), 6) AS dg,
           round(radians(l_quantity), 6) AS rd,
           round(pi(), 6) AS pi_val
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """

_sql_query(
    "fn_math",
    _FN_MATH_SQL,
    oracle=_FN_MATH_SQL,
    tags=("functions", "math"),
)

# --- bitwise (BitwiseFunctions.java, 20 fns) ---------------------------------

_sql_query(
    "fn_bitwise",
    """
    SELECT l_orderkey,
           l_orderkey << 2 AS shl,
           l_orderkey >> 1 AS shr,
           l_orderkey & 7 AS band,
           l_orderkey | 8 AS bor,
           l_orderkey ^ 5 AS bxor,
           ~l_orderkey AS bnot
    FROM lineitem WHERE l_orderkey < 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    oracle="""
    SELECT l_orderkey,
           l_orderkey << 2 AS shl,
           l_orderkey >> 1 AS shr,
           l_orderkey & 7 AS band,
           l_orderkey | 8 AS bor,
           xor(l_orderkey, 5) AS bxor,
           ~l_orderkey AS bnot
    FROM lineitem WHERE l_orderkey < 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    tags=("functions", "bitwise"),
    doc="^ is XOR in Spark but exponent in DuckDB — oracle uses xor().",
)

# --- arrays (Array*.java, 50+ files) — outputs stringified: array-typed
# result columns would be hash-fragile across engines ------------------------

_sql_query(
    "fn_array",
    """
    WITH t AS (SELECT doc_id, slice(split(text, ' '), 1, 8) AS w
               FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           size(w) AS n,
           array_contains(w, 'data') AS has_data,
           array_position(w, 'data') AS data_pos,
           array_join(array_sort(array_distinct(w)), ',') AS distinct_sorted,
           array_join(slice(w, 2, 3), ',') AS mid3,
           element_at(w, 2) AS second,
           array_join(reverse(w), ',') AS rev,
           array_min(w) AS mn,
           array_max(w) AS mx,
           array_join(sequence(1, 4), ',') AS seq4,
           arrays_overlap(w, array('data', 'query')) AS ovl
    FROM t
    ORDER BY doc_id
    """,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ')[1:8] AS w
               FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           len(w) AS n,
           list_contains(w, 'data') AS has_data,
           coalesce(list_position(w, 'data'), 0) AS data_pos,
           array_to_string(list_sort(list_distinct(w)), ',') AS distinct_sorted,
           array_to_string(w[2:4], ',') AS mid3,
           w[2] AS second,
           array_to_string(list_reverse(w), ',') AS rev,
           list_min(w) AS mn,
           list_max(w) AS mx,
           array_to_string(range(1, 5), ',') AS seq4,
           len(list_intersect(w, ['data', 'query'])) > 0 AS ovl
    FROM t
    ORDER BY doc_id
    """,
    tags=("functions", "array"),
    doc="array_position: Spark returns 0 when absent, DuckDB NULL (oracle coalesces).",
)

# --- higher-order functions (lambdas; ArrayTransformFunction.java etc.) ------

_sql_query(
    "fn_higher_order",
    """
    WITH t AS (SELECT doc_id, slice(split(text, ' '), 1, 10) AS w
               FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           aggregate(transform(w, x -> length(x)), 0, (a, x) -> a + x) AS total_len,
           array_join(transform(w, (x, i) -> concat(x, '_', i)), ',') AS indexed,
           array_join(filter(w, x -> length(x) > 4), ',') AS long_words,
           exists(w, x -> x = 'data') AS any_data,
           forall(w, x -> length(x) > 1) AS all_gt1,
           array_join(zip_with(w, reverse(w), (a, b) -> concat(a, '|', b)), ',') AS zipped
    FROM t
    ORDER BY doc_id
    """,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ')[1:10] AS w
               FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           list_reduce(list_prepend(0, list_transform(w, x -> length(x))), (a, x) -> a + x) AS total_len,
           array_to_string(list_transform(w, (x, i) -> concat(x, '_', i - 1)), ',') AS indexed,
           array_to_string(list_filter(w, x -> length(x) > 4), ',') AS long_words,
           len(list_filter(w, x -> x = 'data')) > 0 AS any_data,
           len(list_filter(w, x -> length(x) <= 1)) = 0 AS all_gt1,
           array_to_string(list_transform(list_zip(w, list_reverse(w)),
                                          z -> concat(z[1], '|', z[2])), ',') AS zipped
    FROM t
    ORDER BY doc_id
    """,
    tags=("functions", "higher-order"),
    doc="transform with index: Spark i is 0-based, DuckDB 1-based (oracle subtracts).",
)

# --- maps (Map*.java) — scalars extracted so outputs stay hashable -----------

_sql_query(
    "fn_map",
    """
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               str_to_map(concat('q=', l_quantity, ',ln=', l_linenumber), ',', '=') AS m
        FROM lineitem WHERE l_orderkey < 200
    )
    SELECT l_orderkey, l_linenumber,
           size(m) AS msize,
           try_element_at(m, 'q') AS q_val,
           try_element_at(m, 'missing') AS missing_val,
           array_join(array_sort(map_keys(m)), ',') AS keys_sorted,
           cardinality(map_entries(m)) AS n_entries
    FROM t
    ORDER BY l_orderkey, l_linenumber
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           2 AS msize,
           CAST(l_quantity AS VARCHAR) AS q_val,
           CAST(NULL AS VARCHAR) AS missing_val,
           'ln,q' AS keys_sorted,
           2 AS n_entries
    FROM lineitem WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("functions", "map"),
    doc="Presto element_at(map) returns NULL on missing key → Spark try_element_at.",
)

# --- JSON (JsonFunctions.java, 22 fns) ----------------------------------------

_sql_query(
    "fn_json",
    """
    SELECT event_id,
           get_json_object(props, '$.k') AS k_str,
           from_json(props, 'k INT').k AS k_int,
           to_json(named_struct('id', event_id, 'type', event_type)) AS packed
    FROM events WHERE event_id < 2000
    ORDER BY event_id
    """,
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           to_json(struct_pack(id := event_id, type := event_type)) AS packed
    FROM events WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("functions", "json"),
)

# --- URL (UrlFunctions.java, 9 fns) ------------------------------------------

_sql_query(
    "fn_url",
    """
    WITH t AS (
        SELECT c_custkey,
               concat('https://n', c_nationkey, '.example.com/seg/', c_mktsegment,
                      '?cust=', c_custkey, '&bal=', CAST(c_acctbal AS STRING)) AS url
        FROM customer WHERE c_custkey < 100
    )
    SELECT c_custkey,
           parse_url(url, 'HOST') AS host,
           parse_url(url, 'PATH') AS path,
           parse_url(url, 'PROTOCOL') AS proto,
           parse_url(url, 'QUERY', 'cust') AS cust_param
    FROM t
    ORDER BY c_custkey
    """,
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               concat('https://n', c_nationkey, '.example.com/seg/', c_mktsegment,
                      '?cust=', c_custkey, '&bal=', CAST(c_acctbal AS VARCHAR)) AS url
        FROM customer WHERE c_custkey < 100
    )
    SELECT c_custkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '[?&]cust=([^&]*)', 1) AS cust_param
    FROM t
    ORDER BY c_custkey
    """,
    tags=("functions", "url"),
)

# --- conditional / TRY (TryCastFunction.java, conditional grammar) -----------

_sql_query(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final' ELSE 'other' END AS st,
           CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
           if(o_orderpriority = '1-URGENT', 1, 0) AS urgent,
           nullif(o_orderstatus, 'P') AS st_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS st_filled,
           try_cast(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
           try_cast(o_orderpriority AS INT) AS bad_cast,
           ifnull(nullif(o_orderstatus, 'P'), 'X') AS nvl_like
    FROM orders WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final' ELSE 'other' END AS st,
           CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
           if(o_orderpriority = '1-URGENT', 1, 0) AS urgent,
           nullif(o_orderstatus, 'P') AS st_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS st_filled,
           try_cast(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
           try_cast(o_orderpriority AS INT) AS bad_cast,
           ifnull(nullif(o_orderstatus, 'P'), 'X') AS nvl_like
    FROM orders WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
    tags=("functions", "conditional"),
)

# --- hashing / binary (VarbinaryFunctions.java) ------------------------------

_sql_query(
    "fn_hash",
    """
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha2(text, 256) AS sha256_hex,
           base64(cast(substr(text, 1, 12) AS BINARY)) AS b64,
           hex(cast(substr(text, 1, 4) AS BINARY)) AS hx
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id
    """,
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           base64(encode(substr(text, 1, 12))) AS b64,
           hex(encode(substr(text, 1, 4))) AS hx
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id
    """,
    tags=("functions", "hash"),
)

# Spark-native hashes with no cross-engine oracle (xxhash64/crc32/murmur3) —
# rows-only check; determinism asserted by the pytest suite instead. The
# z_ prefix keeps this rows-only entry out of the driver's oracle-checked
# window (see queries/registry.py naming note).
_sql_query(
    "fn_hash_spark_native",
    """
    SELECT xxhash64('abc') = 1423657621850124518 AS xx_vector,
           xxhash64('') = -7444071767201028348 AS xx_empty_vector,
           xxhash64('abc', 42L) = 7177339324260083364 AS xx_seeded_vector,
           hash('abc') = 1322437556 AS murmur_vector,
           crc32(cast('abc' AS BINARY)) = 891568578 AS crc_vector,
           (SELECT count(DISTINCT xxhash64(text)) = count(DISTINCT text)
            FROM documents WHERE doc_id < 50) AS xx_injective_on_sample,
           (SELECT count(DISTINCT hash(text)) = count(DISTINCT text)
            FROM documents WHERE doc_id < 50) AS murmur_injective_on_sample
    """,
    oracle="""
    SELECT TRUE AS xx_vector, TRUE AS xx_empty_vector, TRUE AS xx_seeded_vector,
           TRUE AS murmur_vector, TRUE AS crc_vector,
           TRUE AS xx_injective_on_sample, TRUE AS murmur_injective_on_sample
    """,
    tags=("functions", "hash"),
    doc="Engine-native hashes (xxhash64/Murmur3/crc32) checked against "
    "pinned test vectors plus injectivity over the documents sample — "
    "converts the last rows-only registry entry to oracle-checked "
    "(VarbinaryFunctions.java xxhash64, round-1 verdict wrong #3).",
)


# --- Presto-port hashes (spooky_hash_v2_32/64, murmur3_x64_128): the
#     oracle pins the REFERENCE's own golden vectors
#     (TestVarbinaryFunctions.java:310-311, :343-348), so the gate proves
#     bit-parity with Presto, not just self-consistency; injectivity over
#     the documents sample exercises arbitrary-length inputs including the
#     >=192-byte Spooky long path.


@register(
    "fn_hash_presto_ports",
    oracle="""
    SELECT '6BF50919' AS s32_hello_empty, 'D382E6CA' AS s32_hello,
           '232706FC6BF50919' AS s64_empty, '3768826AD382E6CA' AS s64_hello,
           '00000000000000000000000000000000' AS m128_empty,
           '93192FE805BE23041C8318F67EC4F2BC' AS m128_hashme,
           TRUE AS spooky_injective, TRUE AS murmur_injective
    """,
    tags=("functions", "hash"),
    doc="SpookyHashV2 + MurmurHash3-x64-128 pure-Python ports, gate-checked "
    "against the reference's published vectors and injectivity on documents.",
)
def fn_hash_presto_ports(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        SELECT hex(spooky_hash_v2_32(encode('', 'UTF-8'))) AS s32_hello_empty,
               hex(spooky_hash_v2_32(encode('hello', 'UTF-8'))) AS s32_hello,
               hex(spooky_hash_v2_64(encode('', 'UTF-8'))) AS s64_empty,
               hex(spooky_hash_v2_64(encode('hello', 'UTF-8'))) AS s64_hello,
               hex(murmur3_x64_128(encode('', 'UTF-8'))) AS m128_empty,
               hex(murmur3_x64_128(encode('hashme', 'UTF-8'))) AS m128_hashme,
               (SELECT count(DISTINCT spooky_hash_v2_64(encode(repeat(text, 4), 'UTF-8')))
                       = count(DISTINCT text)
                FROM documents WHERE doc_id < 50) AS spooky_injective,
               (SELECT count(DISTINCT murmur3_x64_128(encode(text, 'UTF-8')))
                       = count(DISTINCT text)
                FROM documents WHERE doc_id < 50) AS murmur_injective
        """,
    )


# --- Presto datetime format-string families (DateTimeFunctions.java:1239 —
#     MySQL-% date_format/date_parse; Joda format_datetime). The shim
#     translates patterns driver-side (functions/datetime_fmt.py); the
#     expression itself runs JVM-native. Oracle: DuckDB strftime (C codes).


@register(
    "fn_datetime_presto_formats",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS mysql_fmt,
           strftime(o_orderdate, '%d/%m/%Y') AS mysql_dmy,
           strftime(o_orderdate, '%Y/%m/%d') AS joda_fmt,
           o_orderdate AS roundtrip
    FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey
    """,
    tags=("functions", "datetime"),
    doc="MySQL-%% and Joda pattern translation shims, including a parse round-trip.",
)
def fn_datetime_presto_formats(spark, sf_dir):
    from pyspark.sql import functions as F

    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import datetime_fmt as dfmt

    o = catalog.table(spark, sf_dir, "orders").where("o_orderkey < 30")
    mysql_col = dfmt.presto_date_format(F.col("o_orderdate"), "%Y-%m-%d %H:%i:%S")
    return o.select(
        "o_orderkey",
        mysql_col.alias("mysql_fmt"),
        dfmt.presto_date_format(F.col("o_orderdate"), "%d/%m/%Y").alias("mysql_dmy"),
        dfmt.format_datetime(F.col("o_orderdate"), "yyyy/MM/dd").alias("joda_fmt"),
        dfmt.presto_date_parse(mysql_col, "%Y-%m-%d %H:%i:%S").alias("roundtrip"),
    ).orderBy("o_orderkey")


# --- Presto-name compat layer (functions/presto_compat.py SQL temp
#     functions + functions/udfs.py pandas UDFs), exercised end-to-end so a
#     regression in any registered alias breaks the driver gate. The
#     builder installs the surface via register_all() (idempotent), then
#     touches every SQL temp function and the word_stem/CDF/normalize/HMAC
#     UDFs; the oracle recomputes each with portable DuckDB expressions or
#     precomputed literals (HMAC digests are standards-defined constants).


@register(
    "fn_presto_compat",
    oracle="""
    SELECT o_orderkey,
           strpos(o_orderpriority, '-') AS sp,
           levenshtein(o_orderstatus, 'O') AS lev,
           0::BIGINT AS ham0,
           ascii(o_orderstatus) AS cp,
           CAST(o_orderkey AS VARCHAR) AS jes,
           TRUE AS jac,
           epoch(o_orderdate) AS tut,
           o_orderdate AS rt_ts,
           trunc(o_totalprice / 1000) AS trunc_k,
           TRUE AS nan_ok, TRUE AS inf_ok, TRUE AS fin_ok,
           o_orderkey & 255 AS ba, o_orderkey | 8 AS bo,
           xor(o_orderkey, 5) AS bx, ~o_orderkey AS bn,
           o_orderkey << 2 AS bls,
           ((-o_orderkey) >> 3) & ((1::BIGINT << 61) - 1) AS brs_logical,
           (-o_orderkey) >> 3 AS brs_arith,
           288230376151711743::BIGINT AS blsr64,
           (o_orderkey & 255) >> 2 AS blsr8,
           (o_orderkey << 3) & 255 AS bsl8,
           6.0 AS asum, 2.0 AS aavg, TRUE AS adup,
           '0.6,0.8' AS anorm, 1::BIGINT AS ngram_n,
           'example.com' AS host, '/p' AS path, 'https' AS proto,
           'q=1' AS query, '1' AS param, 'frag' AS frag,
           o_orderstatus AS b64_rt, o_orderstatus AS hex_rt,
           strpos(o_orderpriority, '-') AS td_index,
           '00410042' AS c2h,
           round((0.85 + 1.96 * 1.96 / 200
                  - 1.96 * sqrt(0.85 * 0.15 / 100 + 1.96 * 1.96 / 40000))
                 / (1 + 1.96 * 1.96 / 100), 6) AS wil,
           round((0.85 + 1.96 * 1.96 / 200
                  + 1.96 * sqrt(0.85 * 0.15 / 100 + 1.96 * 1.96 / 40000))
                 / (1 + 1.96 * 1.96 / 100), 6) AS wiu,
           'ff' AS tb, 255::BIGINT AS fb,
           '1|3' AS s2mm, '1|2' AS mmfe, 0.75 AS mnorm,
           'stori' AS stem1, lower(o_orderstatus) AS stem2,
           0.975002 AS ncdf, 1.96 AS incdf,
           'caf' || chr(233) AS nfc,
           '9D5C73EF85594D34EC4438B7C97E51D8' AS hmac_md5_hex,
           '5031FE3D989C6D1537A013FA6E739DA23463FDAEC3B70137D828E36ACE221BD0' AS hmac_sha256_hex,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS td_char,
           '2021-07-09' AS td_date,
           '2021-07-09 11:22:33' AS td_ts,
           6::BIGINT AS comb2_n,
           'ab,ac,bc' AS comb2_str
    FROM orders WHERE o_orderkey < 50
    ORDER BY o_orderkey
    """,
    tags=("functions", "compat"),
    doc="End-to-end exercise of the Presto-name compat surface (SQL temp fns + pandas UDFs).",
)
def fn_presto_compat(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               strpos(o_orderpriority, '-') AS sp,
               levenshtein_distance(o_orderstatus, 'O') AS lev,
               hamming_distance(o_orderpriority, o_orderpriority) AS ham0,
               codepoint(o_orderstatus) AS cp,
               json_extract_scalar(concat('{"k":', o_orderkey, '}'), '$.k') AS jes,
               json_array_contains_str('["x","y"]', 'x') AS jac,
               to_unixtime(o_orderdate) AS tut,
               presto_from_unixtime(to_unixtime(o_orderdate)) AS rt_ts,
               truncate(o_totalprice / 1000) AS trunc_k,
               is_nan(nan()) AS nan_ok, is_infinite(infinity()) AS inf_ok,
               is_finite(o_totalprice) AS fin_ok,
               bitwise_and(o_orderkey, 255) AS ba, bitwise_or(o_orderkey, 8) AS bo,
               bitwise_xor(o_orderkey, 5) AS bx, bitwise_not(o_orderkey) AS bn,
               bitwise_left_shift(o_orderkey, 2) AS bls,
               bitwise_right_shift(-o_orderkey, 3) AS brs_logical,
               bitwise_right_shift_arithmetic(-o_orderkey, 3) AS brs_arith,
               bitwise_logical_shift_right(-4L, 6, 64) AS blsr64,
               bitwise_logical_shift_right(o_orderkey, 2, 8) AS blsr8,
               bitwise_shift_left(o_orderkey, 3, 8) AS bsl8,
               array_sum(array(1.0D, 2.0D, 3.0D)) AS asum,
               array_average(array(1.0D, 2.0D, 3.0D)) AS aavg,
               array_has_duplicates(array(o_orderstatus, o_orderstatus)) AS adup,
               array_join(transform(array_normalize(array(3.0D, 4.0D), 2.0D),
                                    x -> cast(round(x, 4) AS STRING)), ',') AS anorm,
               cast(size(ngrams(split(o_orderpriority, '-'), 2)) AS BIGINT) AS ngram_n,
               url_extract_host('https://example.com/p?q=1') AS host,
               url_extract_path('https://example.com/p?q=1') AS path,
               url_extract_protocol('https://example.com/p?q=1') AS proto,
               url_extract_query('https://example.com/p?q=1') AS query,
               url_extract_parameter('https://example.com/p?q=1', 'q') AS param,
               url_extract_fragment('https://example.com/p#frag') AS frag,
               decode(from_base64(to_base64(encode(o_orderstatus, 'UTF-8'))), 'UTF-8') AS b64_rt,
               decode(from_hex(to_hex(encode(o_orderstatus, 'UTF-8'))), 'UTF-8') AS hex_rt,
               index(o_orderpriority, '-') AS td_index,
               char2hexint('AB') AS c2h,
               round(wilson_interval_lower(85.0D, 100.0D, 1.96D), 6) AS wil,
               round(wilson_interval_upper(85.0D, 100.0D, 1.96D), 6) AS wiu,
               to_base(255L, 16) AS tb,
               from_base('ff', 16) AS fb,
               array_join(element_at(split_to_multimap('a=1,b=2,a=3', ',', '='), 'a'), '|') AS s2mm,
               array_join(element_at(multimap_from_entries(
                   array(named_struct('k', 'x', 'v', '1'), named_struct('k', 'x', 'v', '2'))), 'x'),
                   '|') AS mmfe,
               round(element_at(map_normalize(map('x', 1.0D, 'y', 3.0D)), 'y'), 4) AS mnorm,
               word_stem('stories') AS stem1,
               word_stem(o_orderstatus) AS stem2,
               round(normal_cdf(0.0D, 1.0D, 1.96D), 6) AS ncdf,
               round(inverse_normal_cdf(0.0D, 1.0D, 0.975D), 4) AS incdf,
               normalize_nfc('café') AS nfc,
               upper(hex(hmac_md5(encode('data', 'UTF-8'), encode('key', 'UTF-8')))) AS hmac_md5_hex,
               upper(hex(hmac_sha256(encode('data', 'UTF-8'), encode('key', 'UTF-8')))) AS hmac_sha256_hex,
               teradata_to_char(o_orderdate, 'yyyy-mm-dd hh24:mi:ss') AS td_char,
               cast(teradata_to_date('2021-07-09', 'yyyy-mm-dd') AS STRING) AS td_date,
               cast(teradata_to_timestamp('2021-07-09 11:22:33', 'yyyy-mm-dd hh24:mi:ss') AS STRING) AS td_ts,
               cast(size(combinations(array('a', 'b', 'c', 'd'), 2)) AS BIGINT) AS comb2_n,
               array_join(transform(combinations(array('a', 'b', 'c'), 2),
                                    x -> array_join(x, '')), ',') AS comb2_str
        FROM orders WHERE o_orderkey < 50
        ORDER BY o_orderkey
        """,
    )


# --- TRY semantics (TryFunction.java, TryCastFunction.java) + Presto
#     integer-division truncation (SURVEY.md §7 'what's hard'). Spark's
#     try_* family gives expression-level TRY; `div` gives Presto's
#     truncating integer '/'. ------------------------------------------------

_sql_query(
    "fn_try_semantics",
    """
    SELECT o_orderkey,
           try_cast(o_orderpriority AS INT) AS bad_cast,
           try_cast(substring(o_orderpriority, 1, 1) AS INT) AS good_cast,
           try_divide(o_totalprice, o_orderkey % 3) AS maybe_div,
           o_orderkey div 7 AS int_div,
           try_element_at(array(1, 2, 3), 99) AS oob_elem
    FROM orders WHERE o_orderkey < 30
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderpriority AS INT) AS bad_cast,
           try_cast(substring(o_orderpriority, 1, 1) AS INT) AS good_cast,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS maybe_div,
           o_orderkey // 7 AS int_div,
           NULL::INT AS oob_elem
    FROM orders WHERE o_orderkey < 30
    ORDER BY o_orderkey
    """,
    tags=("functions", "conditional", "try"),
)


# --- IP address/prefix functions (IpPrefixFunctions.java:50-135;
#     IPADDRESS/IPPREFIX travel as canonical strings, arithmetic is
#     Arrow-vectorized over stdlib ipaddress — IPv4 AND IPv6 work; the
#     oracle replays the IPv4 cases with pure integer arithmetic) ------------


@register(
    "fn_ip",
    oracle="""
    WITH a AS (
        SELECT c_custkey,
               10 * 16777216 + ((c_custkey // 256) % 256) * 65536 +
               (c_custkey % 256) * 256 + ((c_custkey * 7) % 256) AS ipint
        FROM customer WHERE c_custkey <= 40
    )
    SELECT c_custkey,
           '10.' || ((ipint // 65536) % 256) || '.' || ((ipint // 256) % 256) || '.0/24'
               AS pfx24,
           '10.' || ((ipint // 65536) % 256) || '.' || ((ipint // 256) % 256) || '.0'
               AS sub_min,
           '10.' || ((ipint // 65536) % 256) || '.' || ((ipint // 256) % 256) || '.255'
               AS sub_max,
           '10.' || ((ipint // 65536) % 256) || '.' || ((ipint // 256) % 256) || '.0,' ||
           '10.' || ((ipint // 65536) % 256) || '.' || ((ipint // 256) % 256) || '.255'
               AS sub_range,
           ipint % 4294967296 BETWEEN 10 * 16777216 AND 10 * 16777216 + 8388607
               AS in_10_0_0_0_slash9,
           TRUE AS nested_24_in_16
    FROM a
    ORDER BY c_custkey
    """,
    tags=("functions", "ip"),
    doc="IpPrefixFunctions.java parity: ip_prefix, ip_subnet_min/max/range, "
    "is_subnet_of (address and prefix overloads), Arrow-vectorized.",
)
def fn_ip(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions.ip import register_ip_functions

    register_ip_functions(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        WITH a AS (
            SELECT c_custkey,
                   concat('10.', (c_custkey div 256) % 256, '.', c_custkey % 256,
                          '.', (c_custkey * 7) % 256) AS ip
            FROM customer WHERE c_custkey <= 40
        )
        SELECT c_custkey,
               ip_prefix(ip, 24) AS pfx24,
               ip_subnet_min(ip_prefix(ip, 24)) AS sub_min,
               ip_subnet_max(ip_prefix(ip, 24)) AS sub_max,
               concat_ws(',', ip_subnet_range(ip_prefix(ip, 24))) AS sub_range,
               is_subnet_of('10.0.0.0/9', ip) AS in_10_0_0_0_slash9,
               is_subnet_of(ip_prefix(ip, 16), ip_prefix(ip, 24)) AS nested_24_in_16
        FROM a
        ORDER BY c_custkey
        """,
    )


# --- long-tail compat sweep (round-2: the remaining @ScalarFunction names
#     from operator/scalar/*.java get shims; see presto_compat.py) ----------


@register(
    "fn_presto_compat2",
    oracle="""
    SELECT o_orderkey,
           'UTC' AS tz, 0 AS tzh, 0 AS tzm,
           0 AS ms,
           strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY, '%Y-%m-%d') AS eom,
           '2021-07-09' AS iso_d,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.000Z') AS iso_ts,
           90.0 AS dur_s,
           5242880.0 AS five_mb,
           CASE WHEN position('-' IN reverse(o_orderpriority)) = 0 THEN 0
                ELSE length(o_orderpriority) - position('-' IN reverse(o_orderpriority)) END + 1
               AS last_dash,
           o_orderstatus AS b64url_rt,
           o_orderkey AS be64_rt,
           CAST(o_orderkey % 100 AS INT) - 50 AS be32_rt,
           TRUE AS scalar_num, FALSE AS scalar_obj,
           '2' AS arr_1,
           TRUE AS has_25,
           'a,b' AS trimmed
    FROM orders WHERE o_orderkey < 40
    ORDER BY o_orderkey
    """,
    tags=("functions", "compat"),
    doc="Long-tail scalar shims: iso8601, duration/data-size parsing, "
    "strrpos, base64url, big-endian codecs, json scalar probes, trim_array.",
)
def fn_presto_compat2(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               current_timezone() AS tz,
               timezone_hour(o_orderdate) AS tzh,
               timezone_minute(o_orderdate) AS tzm,
               millisecond(o_orderdate) AS ms,
               cast(last_day_of_month(cast(o_orderdate AS DATE)) AS STRING) AS eom,
               cast(from_iso8601_date('2021-07-09') AS STRING) AS iso_d,
               to_iso8601(o_orderdate) AS iso_ts,
               cast(extract(MINUTE FROM parse_duration('90s')) * 60
                    + extract(SECOND FROM parse_duration('90s')) AS DOUBLE) AS dur_s,
               parse_presto_data_size('5MB') AS five_mb,
               strrpos(o_orderpriority, '-') AS last_dash,
               decode(from_base64url(to_base64url(encode(o_orderstatus, 'UTF-8'))), 'UTF-8') AS b64url_rt,
               from_big_endian_64(to_big_endian_64(o_orderkey)) AS be64_rt,
               from_big_endian_32(to_big_endian_32(cast(o_orderkey % 100 AS INT) - 50)) AS be32_rt,
               is_json_scalar('42') AS scalar_num,
               is_json_scalar('{"k":1}') AS scalar_obj,
               json_array_get('[1,2,3]', 1) AS arr_1,
               json_array_contains_num('[12.5, 25.0]', 25.0) AS has_25,
               array_join(trim_array(array('a', 'b', 'c'), 1), ',') AS trimmed
        FROM orders WHERE o_orderkey < 40
        ORDER BY o_orderkey
        """,
    )


# --- round-3 parity tranche: names surfaced by diffing every
#     @ScalarFunction/@SqlInvokedScalarFunction in the reference against
#     spark.catalog.listFunctions() after register_all() ---------------------
#
# ISO-8601 date parts (DateTimeFunctions.java:969-1150), at_timezone
# (:318), array_frequency/array_duplicates (ArraySqlFunctions.java:56-97),
# json_extract/json_size (JsonFunctions.java), split_to_map
# (StringFunctions.java), key_sampling_percent (SimpleSamplingPercent.java).
# The frequency map is canonicalized to sorted "k:v" entries on both sides
# (map iteration order is engine-specific); key_sampling_percent is checked
# as a property (deterministic, [0,1), 1%-granular) since its hash bits are
# engine-specific by design.


@register(
    "fn_presto_compat3",
    oracle="""
    SELECT o_orderkey,
           CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dw,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
           CAST(week(CAST(o_orderdate AS DATE)) AS BIGINT) AS wk,
           CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS yw,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL '5 hours'
                    + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS atz,
           array_to_string(
               list_transform(
                   list_sort(list_distinct(list_filter(
                       str_split(o_orderpriority, '-'), x -> x IS NOT NULL))),
                   x -> x || ':' || CAST(len(list_filter(
                       str_split(o_orderpriority, '-'), y -> y = x)) AS VARCHAR)),
               ',') AS freq,
           array_to_string(
               list_sort(list_filter(
                   list_distinct([o_orderstatus, o_orderpriority, o_orderstatus]),
                   x -> len(list_filter([o_orderstatus, o_orderpriority, o_orderstatus],
                                        y -> y = x)) > 1)),
               ',') AS dups,
           CAST(o_orderkey AS VARCHAR) AS first_elem,
           CAST(o_orderkey % 5 + 1 AS INT) AS n_elems,
           o_orderpriority AS mp,
           o_orderstatus AS ms,
           CAST(o_orderkey AS VARCHAR) AS mk,
           TRUE AS ksp_ok
    FROM orders WHERE o_orderkey < 60
    ORDER BY o_orderkey
    """,
    tags=("functions", "compat"),
    doc="Parity tranche 3: ISO date parts (day_of_week/doy/week/year_of_week),"
    " at_timezone, array_frequency/array_duplicates, json_extract/json_size,"
    " split_to_map, key_sampling_percent.",
)
def fn_presto_compat3(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   cast(o_orderdate AS DATE) AS d,
                   concat('[', array_join(array_repeat(cast(o_orderkey AS STRING),
                          cast(o_orderkey % 5 + 1 AS INT)), ','), ']') AS jarr,
                   concat('p=', o_orderpriority, '|s=', o_orderstatus,
                          '|k=', o_orderkey) AS kvs
            FROM orders WHERE o_orderkey < 60
        )
        SELECT o_orderkey,
               day_of_week(d) AS dw,
               doy(d) AS doy,
               week_of_year(d) AS wk,
               year_of_week(d) AS yw,
               cast(at_timezone(cast(d AS TIMESTAMP), 'Asia/Kolkata') AS STRING) AS atz,
               array_join(transform(
                   array_sort(map_keys(array_frequency(split(o_orderpriority, '-')))),
                   k -> concat(k, ':', array_frequency(split(o_orderpriority, '-'))[k])),
                   ',') AS freq,
               array_join(array_sort(array_duplicates(
                   array(o_orderstatus, o_orderpriority, o_orderstatus))), ',') AS dups,
               json_extract(jarr, '$[0]') AS first_elem,
               json_size(concat('{"a": ', jarr, '}'), '$.a') AS n_elems,
               split_to_map(kvs, '|', '=')['p'] AS mp,
               split_to_map(kvs, '|', '=')['s'] AS ms,
               split_to_map(kvs, '|', '=')['k'] AS mk,
               key_sampling_percent(cast(o_orderkey AS STRING)) >= 0
                   AND key_sampling_percent(cast(o_orderkey AS STRING)) < 1
                   AND key_sampling_percent(cast(o_orderkey AS STRING))
                       = round(key_sampling_percent(cast(o_orderkey AS STRING)), 2)
                   AS ksp_ok
        FROM src
        ORDER BY o_orderkey
        """,
    )


# --- color functions (ColorFunctions.java; round 3 closes the last
#     "partial by design" family) ---------------------------------------------
#
# color/rgb/render/bar over the orders table. The ANSI-cube math
# (c*6/256 per channel, ColorFunctions.toAnsi:250-258) is exact integer
# arithmetic, so the oracle reproduces every escape sequence
# bit-for-bit; the HSB gradient path is exercised with equal endpoints
# (interpolation of c->c is exactly c for every fraction), which keeps
# the pandas-UDF bar in the differential gate too. The float32 gradient
# itself is golden-tested against TestColorFunctions.java in
# tests/test_color.py.


@register(
    "fn_color",
    oracle="""
    WITH c AS (
        SELECT o_orderkey,
               (o_orderkey * 7) % 256 AS r,
               (o_orderkey * 13) % 256 AS g,
               (o_orderkey * 29) % 256 AS b,
               (o_orderkey % 10) / 10.0 AS pct
        FROM orders WHERE o_orderkey < 60
    ),
    p AS (
        SELECT o_orderkey, pct, r * 65536 + g * 256 + b AS packed,
               16 + (r * 6 // 256) * 36 + (g * 6 // 256) * 6 + (b * 6 // 256) AS ansi
        FROM c
    )
    SELECT o_orderkey,
           packed,
           CAST(16711680 AS BIGINT) AS hex_f00,
           CAST(-7 AS BIGINT) AS sys_cyan,
           ansi,
           chr(27) || '[38;5;' || ansi || 'm' || 'val' || chr(27) || '[0m' AS rendered,
           CASE WHEN o_orderkey % 2 = 0
                THEN chr(27) || '[38;5;2m' || '✓' || chr(27) || '[0m'
                ELSE chr(27) || '[38;5;1m' || '✗' || chr(27) || '[0m' END AS rb,
           repeat(chr(27) || '[38;5;' || ansi || 'm' || '█',
                  CAST(floor(pct * 8) AS INTEGER))
               || chr(27) || '[0m'
               || repeat(' ', 8 - CAST(floor(pct * 8) AS INTEGER)) AS bar8
    FROM p
    ORDER BY o_orderkey
    """,
    tags=("functions", "color"),
    doc="Presto color surface (ColorFunctions.java): color/rgb/"
    "color_to_ansi/render/render_bool + equal-endpoint bar via the "
    "Arrow-vectorized gradient UDF; escape sequences oracle-checked "
    "bit-for-bit.",
)
def fn_color(spark, sf_dir):
    from sensql_presto_spark import catalog
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    return catalog.sql(
        spark,
        sf_dir,
        """
        WITH c AS (
            SELECT o_orderkey,
                   rgb(cast((o_orderkey * 7) % 256 AS BIGINT),
                       cast((o_orderkey * 13) % 256 AS BIGINT),
                       cast((o_orderkey * 29) % 256 AS BIGINT)) AS col,
                   cast((o_orderkey % 10) / 10.0 AS DOUBLE) AS pct
            FROM orders WHERE o_orderkey < 60
        )
        SELECT o_orderkey,
               col AS packed,
               color('#f00') AS hex_f00,
               color('cyan') AS sys_cyan,
               color_to_ansi(col) AS ansi,
               render('val', col) AS rendered,
               render_bool(o_orderkey % 2 = 0) AS rb,
               bar_gradient(pct, 8L, col, col) AS bar8
        FROM c
        ORDER BY o_orderkey
        """,
    )
