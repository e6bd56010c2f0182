-- database: spark; tables: nation; groups: distinct;
SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey
