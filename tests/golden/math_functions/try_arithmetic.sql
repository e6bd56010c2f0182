-- database: spark; tables: ; groups: math_functions;
SELECT try_add(9223372036854775807, 1) AS add_ovf,
       try_multiply(9223372036854775807, 2) AS mul_ovf,
       try_divide(1, 0) AS div0,
       try_add(1, 2) AS ok_add,
       try_to_number('abc', '999') AS bad_num
