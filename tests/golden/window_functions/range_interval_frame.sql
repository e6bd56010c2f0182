-- database: spark; tables: orders; groups: window_functions;
SELECT o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
           AS n_last_90d
FROM orders WHERE o_custkey <= 20
ORDER BY o_orderkey
