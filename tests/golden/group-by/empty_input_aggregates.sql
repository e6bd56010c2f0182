-- database: spark; tables: nation; groups: group-by;
SELECT count(*) AS n, sum(n_nationkey) IS NULL AS sum_null, max(n_name) IS NULL AS max_null
FROM nation WHERE n_nationkey < 0
