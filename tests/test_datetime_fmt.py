"""Format-string translation shims (SURVEY.md §2.8 'needs a shim')."""

from __future__ import annotations

from sensql_presto_spark.functions.datetime_fmt import joda_to_jdk, mysql_to_jdk


def test_mysql_to_jdk_core():
    assert mysql_to_jdk("%Y-%m-%d") == "yyyy-MM-dd"
    assert mysql_to_jdk("%H:%i:%S") == "HH:mm:ss"
    assert mysql_to_jdk("%d/%b/%Y") == "dd/MMM/yyyy"


def test_mysql_literals_are_quoted():
    # letters outside % specifiers must be quoted or JDK treats them as patterns
    assert mysql_to_jdk("%Y at %H") == "yyyy' at 'HH"
    assert mysql_to_jdk("100%%") == "100%"


def test_joda_to_jdk():
    assert joda_to_jdk("YYYY-MM-dd") == "yyyy-MM-dd"
    assert joda_to_jdk("HH:mm ZZ") == "HH:mm xxx"
    assert joda_to_jdk("'at' HH") == "'at' HH"


def test_week_based_patterns_raise_in_pure_translation():
    import pytest

    with pytest.raises(ValueError):
        mysql_to_jdk("%x-%v")
    with pytest.raises(ValueError):
        joda_to_jdk("xxxx-ww")


def test_week_based_format_as_expressions(spark):
    """%v/%x and Joda x/w/e run as weekofyear/ISO-weekyear expressions."""
    from pyspark.sql import functions as F

    from sensql_presto_spark.functions.datetime_fmt import (
        format_datetime,
        presto_date_format,
    )

    df = spark.createDataFrame(
        [("2021-01-01",), ("2020-12-31",), ("2019-12-30",), ("2021-06-15",)],
        ["d"],
    ).select(F.to_timestamp("d").alias("ts"))
    rows = df.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        presto_date_format(F.col("ts"), "%x-%v").alias("mysql_iso"),
        format_datetime(F.col("ts"), "xxxx-'W'ww-e").alias("joda_iso"),
    ).collect()
    got = {r.d: (r.mysql_iso, r.joda_iso) for r in rows}
    # ISO week dates: 2021-01-01 is 2020-W53 Friday(5); 2020-12-31 is
    # 2020-W53 Thursday(4); 2019-12-30 is 2020-W01 Monday(1).
    assert got["2021-01-01"] == ("2020-53", "2020-W53-5")
    assert got["2020-12-31"] == ("2020-53", "2020-W53-4")
    assert got["2019-12-30"] == ("2020-01", "2020-W01-1")
    assert got["2021-06-15"] == ("2021-24", "2021-W24-2")


def test_year_10000_formats_with_exceeds_pad_sign(spark):
    """Probed divergence pinned (r12 fmtshim fuzz-mode exclusion rule):
    JDK 'yyyy' prints years past its 4-digit pad with a leading '+'
    (SignStyle.EXCEEDS_PAD), so year 10000 formats as '+10000' where
    DuckDB strftime %Y prints '10000'.  The fmtshim fuzz generator caps
    its corpus at year 9999 BECAUSE of this contract — if a Spark
    upgrade changes the output, this pin fails and the exclusion rule
    must be re-examined."""
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame([("10000-01-02 03:04:05",)], "s string")
        .select(F.date_format(F.col("s").cast("timestamp"), "yyyy").alias("y"))
        .collect()[0]
    )
    assert row.y == "+10000"
