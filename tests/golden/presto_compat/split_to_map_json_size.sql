-- database: spark; tables: ; groups: presto_compat;
SELECT split_to_map('a=1,b=2', ',', '=')['a'] AS va,
       split_to_map('k.x:1|k.y:2', '|', ':')['k.y'] AS vy,
       json_size('{"a": {"b": [1,2,3]}}', '$.a') AS obj_size,
       json_size('{"a": {"b": [1,2,3]}}', '$.a.b') AS arr_size,
       json_size('{"a": 7}', '$.a') AS scalar_size,
       json_extract('{"a": [5,6]}', '$.a[1]') AS second
