-- database: spark; tables: nation; groups: join;
WITH a AS (SELECT CASE WHEN n_nationkey % 2 = 0 THEN NULL ELSE n_nationkey END AS k FROM nation WHERE n_nationkey < 6),
     b AS (SELECT CASE WHEN n_nationkey % 2 = 0 THEN NULL ELSE n_nationkey END AS k FROM nation WHERE n_nationkey < 6)
SELECT count(*) AS matches FROM a JOIN b ON a.k = b.k
