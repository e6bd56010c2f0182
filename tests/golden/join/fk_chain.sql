-- database: spark; tables: region,nation,customer; groups: join;
SELECT r.r_name, count(*) AS n FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN customer c ON n.n_nationkey = c.c_nationkey GROUP BY r.r_name ORDER BY r.r_name
