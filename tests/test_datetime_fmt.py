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
