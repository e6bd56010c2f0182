-- database: spark; tables: lineitem; groups: conversion;
SELECT cast(l_quantity AS BIGINT) AS qi,
       cast(cast(l_quantity AS BIGINT) AS STRING) AS qs,
       cast(cast(floor(l_extendedprice) AS INT) AS DOUBLE) AS pd,
       cast(l_shipdate AS DATE) AS sd,
       cast('42' AS INT) + 1 AS parsed
FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber
