-- database: spark; tables: lineitem; groups: tpch;
SELECT l_returnflag, l_linestatus,
       sum(cast(l_quantity AS BIGINT)) AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
