-- database: spark; tables: part; groups: math_functions;
SELECT p_partkey, round(sqrt(p_retailprice), 4) AS sq, round(ln(p_retailprice), 4) AS lg, abs(p_size - 25) AS ab, p_size % 7 AS md FROM part WHERE p_partkey < 8 ORDER BY p_partkey
