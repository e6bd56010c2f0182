-- database: spark; tables: nation; groups: map_functions;
SELECT m['a'] AS va, m['b'] AS vb,
       array_join(array_sort(map_keys(m)), ',') AS ks,
       size(m) AS n
FROM VALUES (map('a', 1, 'b', 2)), (map('a', 10, 'b', 20)) AS t(m)
ORDER BY va
