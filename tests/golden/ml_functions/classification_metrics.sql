-- database: spark; tables: orders; groups: ml_functions;
WITH scored AS (
    SELECT (o_totalprice > 150000) AS pred, (o_orderpriority < '3') AS label FROM orders
),
cells AS (
    SELECT CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM scored
)
SELECT tp, fp, fn, round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision_, round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall_ FROM cells
