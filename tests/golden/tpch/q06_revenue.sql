-- database: spark; tables: lineitem; groups: tpch;
SELECT CAST(sum(cast(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
