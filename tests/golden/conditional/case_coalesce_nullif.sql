-- database: spark; tables: nation; groups: conditional;
SELECT n_name,
       CASE WHEN n_regionkey = 0 THEN 'zero' WHEN n_regionkey < 3 THEN 'low' ELSE 'high' END AS band,
       coalesce(nullif(n_regionkey, 0), 99) AS nz,
       if(n_nationkey % 2 = 0, 'even', 'odd') AS parity
FROM nation ORDER BY n_name
