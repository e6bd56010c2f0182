-- database: spark; tables: ; groups: array_functions;
SELECT id, pos, val
FROM (SELECT 1 AS id, array('x', 'y') AS a
      UNION ALL SELECT 2, array()
      UNION ALL SELECT 3, NULL)
LATERAL VIEW OUTER posexplode(a) AS pos, val
ORDER BY id, pos
