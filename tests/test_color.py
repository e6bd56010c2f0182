"""Color-function parity (ColorFunctions.java) against the reference's own
golden expectations (presto-main/.../scalar/TestColorFunctions.java:40-110).
"""

from __future__ import annotations

import pytest

from sensql_presto_spark.functions.color import bar_str, interpolate, to_ansi

RED = 0xFF0000
GREEN = 0x00FF00
MAGENTA = 0xFF00FF
BLUE = 0x0000FF


def test_bar_matches_reference_goldens():
    # TestColorFunctions.testBar:85-95
    assert bar_str(0.6, 5, MAGENTA, BLUE) == (
        "[38;5;201m█[38;5;165m█[38;5;129m█[0m  "
    )
    assert bar_str(1.0, 10, RED, GREEN) == (
        "[38;5;196m█[38;5;202m█[38;5;208m█"
        "[38;5;214m█[38;5;226m█[38;5;226m█"
        "[38;5;154m█[38;5;118m█[38;5;82m█"
        "[38;5;46m█[0m"
    )


def test_to_ansi_and_interpolate():
    assert to_ansi(RED) == 196
    assert to_ansi(GREEN) == 46
    assert to_ansi(-3) == 2  # system green passes through as index
    assert interpolate(0.0, RED, GREEN) == RED
    assert interpolate(1.0, RED, GREEN) == GREEN


def test_sql_color_surface(spark):
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    row = spark.sql(
        """
        SELECT color('black') AS black, color('white') AS white,
               color('#f00') AS hf00, color('#cde') AS hcde,
               rgb(255, 0, 0) AS r, rgb(0, 255, 0) AS g, rgb(0, 0, 255) AS b,
               render('hello', color('red')) AS ren_sys,
               render('hello', color('#f00')) AS ren_rgb,
               render_bool(true) AS rb_t, render_bool(false) AS rb_f,
               bar(cast(0.6 AS double), 5L) IS NOT NULL AS bar_ok,
               bar_gradient(cast(0.6 AS double), 5L, color('#f0f'), color('#00f')) AS bar_g
        """
    ).collect()[0]
    # TestColorFunctions.testColor / testToRgb / testParse
    assert (row.black, row.white) == (-1, -8)
    assert (row.hf00, row.hcde) == (0xFF0000, 0xCCDDEE)
    assert (row.r, row.g, row.b) == (0xFF0000, 0x00FF00, 0x0000FF)
    # testRenderString / testRenderBoolean
    assert row.ren_sys == "[38;5;1mhello[0m"
    assert row.ren_rgb == "[38;5;196mhello[0m"
    assert row.rb_t == "[38;5;2m✓[0m"
    assert row.rb_f == "[38;5;1m✗[0m"
    # testBar through the SQL/UDF path
    assert row.bar_ok
    assert row.bar_g == (
        "[38;5;201m█[38;5;165m█[38;5;129m█[0m  "
    )


def test_sql_color_error_contracts(spark):
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    with pytest.raises(Exception, match="Invalid color"):
        spark.sql("SELECT color('mauve')").collect()
    with pytest.raises(Exception, match="red must be between"):
        spark.sql("SELECT rgb(300, 0, 0)").collect()


def test_normalize_unicode_forms(spark):
    from sensql_presto_spark.functions import register_all

    register_all(spark)
    row = spark.sql(
        """
        SELECT normalize_unicode('cafe\u0301', 'NFC') AS nfc,
               normalize_unicode('café', 'NFD') AS nfd,
               length(normalize_unicode('café', 'NFD')) AS nfd_len,
               normalize_unicode('ﬁ', 'NFKC') AS nfkc
        """
    ).collect()[0]
    assert row.nfc == "café" and len(row.nfc) == 4
    assert row.nfd_len == 5  # e + combining acute
    assert row.nfkc == "fi"  # compatibility decomposition of the ligature
    import pytest as _pytest

    with _pytest.raises(Exception, match="Normalization form"):
        spark.sql("SELECT normalize_unicode('x', 'NFX')").collect()
