-- database: spark; tables: nation; groups: string_functions;
SELECT n_name, lower(n_name) AS lo, substring(n_name, 1, 3) AS pre, length(n_name) AS len, replace(n_name, 'A', '@') AS repl FROM nation WHERE n_nationkey < 5 ORDER BY n_name
