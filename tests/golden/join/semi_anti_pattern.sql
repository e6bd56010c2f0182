-- database: spark; tables: customer,orders; groups: join;
SELECT count(*) AS with_orders FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
