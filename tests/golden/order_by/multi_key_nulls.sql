-- database: spark; tables: nation; groups: order_by;
SELECT n_regionkey, nullif(n_nationkey % 3, 0) AS k, n_name
FROM nation
ORDER BY n_regionkey, k ASC NULLS LAST, n_name DESC
