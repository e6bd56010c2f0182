-- database: spark; tables: lineitem,orders,part; groups: tpcds;
WITH 
    sales AS (
        SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
               l.l_quantity, l.l_extendedprice, l.l_discount, l.l_returnflag,
               l.l_linestatus,
               cast(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
               cast(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS net_c,
               cast(floor(l.l_extendedprice * l.l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
               cast(floor(l.l_extendedprice * l.l_tax * 100 + 0.5) AS BIGINT) AS tax_c,
               cast(l.l_quantity AS BIGINT) AS qty,
               o.o_custkey, o.o_orderdate, o.o_orderpriority, o.o_totalprice,
               year(o.o_orderdate) AS d_year,
               month(o.o_orderdate) AS d_moy,
               quarter(o.o_orderdate) AS d_qoy,
               day(o.o_orderdate) AS d_dom,
               weekofyear(o.o_orderdate) AS d_week_seq,
               year(o.o_orderdate) * 12 + month(o.o_orderdate) AS d_month_seq,
               dayofweek(o.o_orderdate) AS d_dow,
               cast(datediff(l.l_shipdate, o.o_orderdate) AS INT) AS ship_days,
               cast(l.l_orderkey % 24 AS INT) AS t_hour,
               cast(l.l_partkey % 60 AS INT) AS t_minute,
               cast(l.l_orderkey % 10 AS INT) AS hd_dep_count,
               cast(l.l_partkey % 5 AS INT) AS hd_vehicle_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    web AS (SELECT * FROM sales WHERE l_linenumber % 2 = 0),
    cat AS (SELECT * FROM sales WHERE l_linenumber % 2 = 1),
    ret AS (SELECT * FROM sales WHERE l_returnflag = 'R')

    SELECT s.d_year, i.p_brand AS brand,CAST(sum(s.net_c) AS BIGINT) AS ext_price
    FROM sales s JOIN part i ON s.l_partkey = i.p_partkey
    WHERE i.p_size = 1 AND s.d_moy = 11 AND s.d_year = 1995
    GROUP BY s.d_year, i.p_brand
    ORDER BY s.d_year, ext_price DESC, brand
    LIMIT 100
