-- database: spark; tables: ; groups: select_no_from;
SELECT 1 + 2 AS a, 'x' || 'y' AS s, cast(null AS INT) AS n,
       greatest(3, 1, 2) AS g, power(2, 10) AS p
