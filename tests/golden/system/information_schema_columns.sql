-- database: spark; tables: nation region; groups: system;
SELECT table_catalog, table_schema, table_name, column_name, ordinal_position, data_type, is_nullable
FROM information_schema_columns
WHERE table_name IN ('nation', 'region')
ORDER BY table_name, ordinal_position
