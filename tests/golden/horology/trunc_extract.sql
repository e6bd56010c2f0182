-- database: spark; tables: orders; groups: horology;
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS month_start,
       year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       month(o_orderdate) AS m, day(o_orderdate) AS d
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
