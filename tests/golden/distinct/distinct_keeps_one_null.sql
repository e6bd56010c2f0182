-- database: spark; tables: nation; groups: distinct;
SELECT count(*) AS n_rows, count(k) AS n_non_null
FROM (SELECT DISTINCT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS k FROM nation)
