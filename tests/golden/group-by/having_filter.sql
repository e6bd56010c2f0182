-- database: spark; tables: orders; groups: group-by;
SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) >= 8 ORDER BY o_custkey
