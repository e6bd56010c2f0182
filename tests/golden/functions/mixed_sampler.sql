-- database: spark; tables: ; groups: functions;
SELECT abs(-5) AS a, length('spark') AS l, upper('ok') AS u,
       coalesce(NULL, 'fb') AS c, round(2.5) AS r, trunc(cast('2024-02-14' AS DATE), 'MM') AS t
