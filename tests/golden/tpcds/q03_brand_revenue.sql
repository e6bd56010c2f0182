-- database: spark; tables: lineitem,orders,part; groups: tpcds;
WITH 
    sales AS (
        SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
               l.l_quantity, l.l_extendedprice, l.l_discount, l.l_returnflag,
               cast(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
               cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS net_c,
               o.o_custkey, o.o_orderdate, o.o_orderpriority, o.o_totalprice,
               year(o.o_orderdate) AS d_year,
               month(o.o_orderdate) AS d_moy,
               quarter(o.o_orderdate) AS d_qoy
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )

    SELECT d_year, p.p_brand AS brand,CAST(sum(net_c) AS BIGINT) AS sum_agg
    FROM sales JOIN part p ON l_partkey = p.p_partkey
    WHERE p.p_size = 28 AND d_moy = 11
    GROUP BY d_year, p.p_brand
    ORDER BY d_year, sum_agg DESC, brand
    LIMIT 100
