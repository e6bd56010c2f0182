-- database: spark; tables: ; groups: presto_compat;
SELECT array_join(array_duplicates(array('a', 'b', 'a', 'c', 'b')), ',') AS dups,
       array_join(array_dupes(array('x', 'x', 'y')), ',') AS dupes_alias,
       size(array_duplicates(array('p', 'q'))) AS none_dup,
       array_frequency(array('a', 'b', 'a'))['a'] AS freq_a,
       array_frequency(array('a', 'b', 'a'))['b'] AS freq_b
