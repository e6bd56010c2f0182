-- database: spark; tables: ; groups: catalog;
SHOW TABLES
