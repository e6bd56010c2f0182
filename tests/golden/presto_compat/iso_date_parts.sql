-- database: spark; tables: ; groups: presto_compat;
SELECT day_of_week(DATE '2026-08-16') AS dw_sun,
       dow(DATE '2026-08-10') AS dw_mon,
       day_of_year(DATE '2026-02-01') AS doy,
       week(DATE '2021-01-01') AS w53,
       year_of_week(DATE '2021-01-01') AS yow2020,
       yow(DATE '2026-08-14') AS yow2026
