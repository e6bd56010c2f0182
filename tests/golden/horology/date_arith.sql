-- database: spark; tables: orders; groups: horology;
SELECT o_orderkey,
       date_add(cast(o_orderdate AS DATE), 30) AS plus30,
       last_day(o_orderdate) AS eom
FROM orders WHERE o_orderkey <= 64 ORDER BY o_orderkey
