-- database: spark; tables: nation; groups: group-by;
SELECT count(*) AS n, sum(l_quantity) AS sq, round(avg(l_extendedprice), 2) AS ap FROM lineitem
