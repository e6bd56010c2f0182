-- database: spark; tables: region; groups: binary_functions;
SELECT base64('spark') AS b64, hex('OK') AS hx, cast(unbase64('c3Bhcms=') AS STRING) AS rt
FROM region WHERE r_regionkey = 0
