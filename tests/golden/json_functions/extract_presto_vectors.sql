-- database: spark; tables: ; groups: json_functions, presto_compat;
-- Vectors from the reference's TestJsonExtract.java (doJsonExtract /
-- doScalarExtract) — json_extract keeps JSON encoding (string leaves stay
-- quoted, control chars re-escape), json_extract_scalar decodes string
-- leaves and returns NULL for object/array matches AND JSON null leaves;
-- bracket-dialect paths ($[fuu], $.30day, $.1-as-index) normalize via
-- presto_json_path.
SELECT json_extract('{}', '$') AS je_root_obj,
       json_extract('{"fuu": {"bar": 1}}', '$.fuu') AS je_nested,
       json_extract('{"fuu": [0, {"bar": {"key": ["value"]}}, 2]}', '$.fuu[1].bar.key[0]') AS je_deep,
       json_extract('{"fuu": [0, [100, 101], 2]}', '$.fuu[1]') AS je_arr_leaf,
       json_extract('{"fuu": [0, [100, 101], 2]}', '$.fuu[1][1]') AS je_arr_idx,
       json_extract('{"fuu": 1}', '$.bar') AS je_missing,
       json_extract('{"fuu": ["\\u0001"]}', '$.fuu[0]') AS je_ctrl_escape,
       json_extract('{"s": "\\u0041"}', '$.s') AS je_unicode_min,
       json_extract('not json', '$') AS je_malformed,
       json_extract('[0, 1, 2]', '$.1') AS je_dot_index,
       json_extract('{"fuu": 1}', '$[fuu]') AS je_bracket_bare,
       hex(json_extract_scalar('{"fuu": ["\\u0001"]}', '$.fuu[0]')) AS jes_ctrl_decoded_hex,
       json_extract_scalar('null', '$') AS jes_null_leaf,
       json_extract_scalar('"abc"', '$') AS jes_root_str,
       json_extract_scalar('{"fuu": [0.1, 1, 2]}', '$.fuu[0]') AS jes_num,
       json_extract_scalar('{"15day": 0, "30day": 1}', '$.30day') AS jes_digit_led,
       json_extract_scalar('{"0": 0, "1": 1, "2": 2}', '$["1"]') AS jes_quoted_digit,
       cast(json_size('{"a": {"x": 1, "y": 2}}', '$.a') AS INT) AS js_obj,
       cast(json_size('{"a": [1, 2, 3]}', '$.a') AS INT) AS js_arr,
       cast(json_size('{"a": 7}', '$.a') AS INT) AS js_scalar,
       cast(json_size('{"a": 7}', '$.b') AS INT) AS js_missing
