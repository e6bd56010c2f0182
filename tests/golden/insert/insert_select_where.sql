-- database: spark; tables: nation; groups: insert;
CREATE SCHEMA IF NOT EXISTS golden_ins;
DROP TABLE IF EXISTS golden_ins.t_sel;
CREATE TABLE golden_ins.t_sel USING PARQUET AS SELECT n_nationkey, n_name FROM nation WHERE 1 = 0;
INSERT INTO golden_ins.t_sel SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0;
SELECT n_nationkey, n_name FROM golden_ins.t_sel ORDER BY n_nationkey
