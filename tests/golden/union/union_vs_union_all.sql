-- database: spark; tables: nation,region; groups: union;
SELECT x, cnt FROM (
    SELECT 'dedup' AS x, count(*) AS cnt FROM (
        SELECT n_regionkey FROM nation UNION SELECT r_regionkey FROM region)
    UNION ALL
    SELECT 'all' AS x, count(*) AS cnt FROM (
        SELECT n_regionkey FROM nation UNION ALL SELECT r_regionkey FROM region)
) ORDER BY x
