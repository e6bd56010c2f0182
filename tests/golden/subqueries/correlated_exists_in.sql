-- database: spark; tables: nation,customer; groups: subqueries;
SELECT n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
  AND n.n_nationkey IN (SELECT c_nationkey FROM customer)
ORDER BY n_name
