-- database: spark; tables: nation; groups: functions;
SELECT n_nationkey,
       (n_nationkey IN (0, 1, NULL)) IS NULL AS in_unknown,
       n_nationkey IN (0, 1) AS in_true
FROM nation WHERE n_nationkey < 4 ORDER BY n_nationkey
