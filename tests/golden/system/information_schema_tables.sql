-- database: spark; tables: ; groups: system;
SELECT table_catalog, table_schema, table_name, table_type
FROM information_schema_tables
ORDER BY table_name
