-- database: spark; tables: ; groups: presto_compat;
WITH s AS (SELECT hll_sketch_agg(x) AS sk FROM (SELECT explode(array(1, 2, 3)) AS x)),
     t AS (SELECT hll_sketch_agg(x) AS sk FROM (SELECT explode(array(3, 4, 5)) AS x))
SELECT CAST(hll_sketch_estimate(merge_hll(array(s.sk, t.sk))) AS BIGINT) AS est_union,
       CAST(hll_sketch_estimate(merge_hll(array(s.sk))) AS BIGINT) AS est_single,
       merge_hll(CAST(array() AS ARRAY<BINARY>)) IS NULL AS empty_is_null,
       CAST(hll_sketch_estimate(merge_hll(array(s.sk, CAST(NULL AS BINARY)))) AS BIGINT) AS null_skipped
FROM s, t
