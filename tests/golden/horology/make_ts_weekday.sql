-- database: spark; tables: ; groups: horology;
SELECT make_timestamp(1995, 3, 14, 1, 59, 26.535897) AS ts,
       weekday(DATE '1995-03-14') AS wd_mon0,
       dayofweek(DATE '1995-03-14') AS dow_sun1
