-- database: spark; tables: nation; groups: limit;
SELECT count(*) AS n FROM (SELECT * FROM nation LIMIT 0)
