-- database: spark; tables: region; groups: orc;
CREATE SCHEMA IF NOT EXISTS golden_src;
DROP TABLE IF EXISTS golden_src.region_orc;
CREATE TABLE golden_src.region_orc USING ORC AS SELECT r_regionkey, r_name FROM region;
SELECT r_regionkey, r_name FROM golden_src.region_orc ORDER BY r_regionkey
