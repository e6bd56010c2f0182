-- database: spark; tables: ; groups: presto_compat;
SELECT json_parse('{"b" : 2, "a": [1,  "x"]}') AS canonical,
       json_format('{"a": 1}') AS fmt,
       json_array_get('[1, "two", {"k": 3}]', 1) AS elem_str,
       json_array_get('[1, "two", {"k": 3}]', 2) AS elem_obj,
       json_array_get('[1, "two", {"k": 3}]', -1) AS elem_neg,
       json_array_get('[1, "two"]', 5) AS elem_oob
