-- database: spark; tables: ; groups: math_functions;
SELECT bit_count(255) AS c255, bit_count(-1) AS cneg,
       getbit(5, 0) AS b0, getbit(5, 1) AS b1, getbit(5, 2) AS b2
