-- database: spark; tables: ; groups: presto_compat;
SELECT combine_hash(1234567890123456789, -987654321098765432) AS ch_mixed,
       combine_hash(0, 42) AS ch_zero,
       combine_hash(-1, -1) AS ch_neg,
       combine_hash(9223372036854775807, 1) AS ch_wrap,
       any_match(array(1, 2, 3), x -> x > 2) AS am_hit,
       any_match(array(1, 2, 3), x -> x > 9) AS am_miss,
       all_match(array(1, 2, 3), x -> x > 0) AS alm
