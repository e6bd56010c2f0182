-- database: spark; tables: nation; groups: insert;
CREATE SCHEMA IF NOT EXISTS golden_ins;
DROP TABLE IF EXISTS golden_ins.t_grp;
CREATE TABLE golden_ins.t_grp (n_regionkey INT, n BIGINT) USING PARQUET;
INSERT INTO golden_ins.t_grp SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey;
SELECT n_regionkey, n FROM golden_ins.t_grp ORDER BY n_regionkey
