-- database: spark; tables: ; groups: catalog;
SHOW TABLES LIKE 'customer|documents|embeddings|events|lineitem|nation|orders|part|region|supplier'
