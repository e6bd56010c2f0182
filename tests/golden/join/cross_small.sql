-- database: spark; tables: region; groups: join;
SELECT a.r_name, b.r_name AS other FROM region a CROSS JOIN region b WHERE a.r_regionkey < b.r_regionkey ORDER BY a.r_name, other
