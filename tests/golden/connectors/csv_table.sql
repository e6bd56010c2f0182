-- database: spark; tables: nation; groups: connectors;
CREATE SCHEMA IF NOT EXISTS golden_src;
DROP TABLE IF EXISTS golden_src.nation_csv;
CREATE TABLE golden_src.nation_csv USING CSV OPTIONS (header 'true') AS SELECT n_nationkey, n_name, n_regionkey FROM nation;
SELECT count(*) AS n, min(n_nationkey) AS lo, max(n_nationkey) AS hi FROM golden_src.nation_csv
