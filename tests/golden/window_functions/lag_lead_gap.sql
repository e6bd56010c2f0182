-- database: spark; tables: orders; groups: window_functions;
SELECT o_custkey, o_orderkey, o_orderkey - lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS gap FROM orders WHERE o_custkey < 5 ORDER BY o_custkey, o_orderkey
