-- database: spark; tables: ; groups: map_functions;
SELECT cast(map_entries(transform_keys(map('a', 1, 'b', 2), (k, v) -> upper(k))) AS STRING) AS upper_keys,
       cast(map_entries(transform_values(map('a', 1, 'b', 2), (k, v) -> v * 10)) AS STRING) AS v10,
       cast(map_entries(map_zip_with(map('a', 1, 'b', 2), map('a', 10, 'c', 30),
                                (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))) AS STRING) AS zipped
