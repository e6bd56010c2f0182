-- database: spark; tables: nation,region; groups: group-by;
SELECT r_name, n_regionkey,
       cast(grouping(r_name) AS INT) AS g_r,
       cast(grouping(n_regionkey) AS INT) AS g_n,
       cast(grouping_id(r_name, n_regionkey) AS INT) AS gid,
       count(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, n_regionkey)
ORDER BY gid, r_name NULLS FIRST, n_regionkey NULLS FIRST
