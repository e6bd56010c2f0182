-- database: spark; tables: nation; groups: array_functions;
SELECT size(xs) AS n,
       array_join(transform(xs, x -> x * 2), ',') AS doubled,
       array_join(filter(xs, x -> x % 2 = 0), ',') AS evens,
       aggregate(xs, 0, (acc, x) -> acc + x) AS total,
       array_max(xs) AS mx
FROM VALUES (array(3, 1, 4, 1, 5)), (array(2, 7, 1, 8)) AS t(xs)
ORDER BY n
