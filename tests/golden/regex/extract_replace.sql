-- database: spark; tables: nation; groups: regex;
SELECT n_name,
       regexp_extract(n_name, '([0-9]+)', 1) AS num,
       regexp_replace(n_name, '[0-9]+', '#') AS masked,
       n_name RLIKE '^NATION_1[0-9]$' AS teens
FROM nation WHERE n_nationkey < 15 ORDER BY n_name
