-- database: spark; tables: lineitem; groups: aggregate;
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ()) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
