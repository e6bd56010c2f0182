-- database: spark; tables: nation; groups: json_functions;
SELECT j,
       get_json_object(j, '$.a') AS a,
       get_json_object(j, '$.b.c') AS bc,
       get_json_object(j, '$.arr[1]') AS arr1,
       cast(json_array_length(get_json_object(j, '$.arr')) AS INT) AS arr_len
FROM VALUES ('{"a":1,"b":{"c":"x"},"arr":[10,20,30]}'),
            ('{"a":null,"b":{},"arr":[]}') AS t(j)
ORDER BY j
