-- database: spark; tables: customer,nation; groups: with_clause;
WITH big AS (SELECT * FROM customer WHERE c_acctbal > 5000),
     by_nation AS (SELECT c_nationkey, count(*) AS n FROM big GROUP BY c_nationkey)
SELECT n.n_name, b.n FROM by_nation b JOIN nation n ON b.c_nationkey = n.n_nationkey
WHERE b.n >= 2 ORDER BY n.n_name
