-- database: spark; tables: customer,supplier; groups: set_operation;
SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier EXCEPT SELECT n_nationkey FROM nation WHERE n_regionkey = 0 ORDER BY k
