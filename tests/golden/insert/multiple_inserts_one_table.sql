-- database: spark; tables: region; groups: insert;
CREATE SCHEMA IF NOT EXISTS golden_ins;
DROP TABLE IF EXISTS golden_ins.t_multi;
CREATE TABLE golden_ins.t_multi (r_regionkey INT, r_name STRING) USING PARQUET;
INSERT INTO golden_ins.t_multi SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2;
INSERT INTO golden_ins.t_multi SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 2;
INSERT INTO golden_ins.t_multi VALUES (99, 'SYNTHETIC');
SELECT r_regionkey, r_name FROM golden_ins.t_multi ORDER BY r_regionkey
