-- database: spark; tables: ; groups: select_no_from;
SELECT s.col0 AS k, s.col1 AS v
FROM (SELECT stack(3, 'a', 1, 'b', 2, 'c', 3)) s
ORDER BY k
