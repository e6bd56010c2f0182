-- database: spark; tables: ; groups: presto_compat;
SELECT json_extract('{"a": "x"}', '$.a') AS je_str,
       json_extract_scalar('{"a": "x"}', '$.a') AS jes_str,
       json_extract_scalar('{"a": {"b": 2}}', '$.a') AS jes_obj,
       json_extract('{"a": true}', '$.a') AS je_bool,
       json_extract('{"a": null}', '$.a') AS je_null,
       json_extract('{"a": {"b": 2}}', '$.a') AS je_obj,
       json_extract('{"a": [1, "y"]}', '$.a[1]') AS je_arr_str,
       json_extract('{"a": 7}', '$.a') AS je_num
