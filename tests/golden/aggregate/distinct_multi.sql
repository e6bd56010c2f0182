-- database: spark; tables: lineitem; groups: aggregate;
SELECT l_returnflag, count(DISTINCT l_partkey) AS dp, count(DISTINCT l_suppkey) AS ds, count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
