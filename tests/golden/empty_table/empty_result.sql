-- database: spark; tables: nation; groups: empty_table;
SELECT n_name FROM nation WHERE n_nationkey < 0 ORDER BY n_name
