-- database: spark; tables: nation; groups: binary_functions;
SELECT n_name, md5(n_name) AS m, length(md5(n_name)) AS hexlen
FROM nation WHERE n_nationkey < 5 ORDER BY n_name
