-- database: spark; tables: orders; groups: window_functions;
SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS running FROM orders WHERE o_custkey < 10 ORDER BY o_custkey, o_orderkey
