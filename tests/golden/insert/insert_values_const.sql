-- database: spark; tables: ; groups: insert;
CREATE SCHEMA IF NOT EXISTS golden_ins;
DROP TABLE IF EXISTS golden_ins.t_const;
CREATE TABLE golden_ins.t_const (id BIGINT, name STRING) USING PARQUET;
INSERT INTO golden_ins.t_const VALUES (1, 'alpha'), (2, 'beta'), (3, NULL);
SELECT id, name FROM golden_ins.t_const ORDER BY id
