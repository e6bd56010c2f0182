"""Datetime format-string shims: MySQL-% (Presto date_format/date_parse) and
Joda (Presto format_datetime/parse_datetime) → JDK DateTimeFormatter patterns.

The reference's DateTimeFunctions.java exposes both families; Spark's
date_format/to_timestamp speak JDK patterns only (SURVEY.md §2.8 "needs a
format-string translation shim"). Translation happens driver-side on the
(almost always literal) pattern, so execution stays JVM-native.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MySQL specifier -> JDK pattern (DateTimeFunctions.java:1239-1290 parity).
_MYSQL_TO_JDK: dict[str, str] = {
    "a": "EEE",
    "b": "MMM",
    "c": "M",
    "d": "dd",
    "e": "d",
    "f": "SSSSSS",
    "H": "HH",
    "h": "hh",
    "I": "hh",
    "i": "mm",
    "j": "DDD",
    "k": "H",
    "l": "h",
    "M": "MMMM",
    "m": "MM",
    "p": "a",
    "r": "hh:mm:ss a",
    "S": "ss",
    "s": "ss",
    "T": "HH:mm:ss",
    "v": "ww",
    "W": "EEEE",
    "x": "YYYY",
    "Y": "yyyy",
    "y": "yy",
    "%": "%",
}

# Joda tokens that differ from JDK; all others pass through.
_JODA_TO_JDK: dict[str, str] = {
    "Y": "y",  # Joda year-of-era -> JDK y
    "x": "Y",  # Joda weekyear -> JDK Y
    "e": "e",  # day-of-week number (close enough; locale-dependent)
    "ZZ": "xxx",
    "Z": "xx",
}


def _quote_literal(text: str) -> str:
    """Quote a literal run for a JDK pattern (letters are pattern chars)."""
    if not text:
        return ""
    if any(c.isalpha() for c in text) or "'" in text:
        return "'" + text.replace("'", "''") + "'"
    return text


def mysql_to_jdk(fmt: str) -> str:
    out: list[str] = []
    literal: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            if literal:
                out.append(_quote_literal("".join(literal)))
                literal = []
            spec = fmt[i + 1]
            if spec == "%":
                literal.append("%")
            else:
                out.append(_MYSQL_TO_JDK.get(spec, _quote_literal(spec)))
            i += 2
        else:
            literal.append(ch)
            i += 1
    if literal:
        out.append(_quote_literal("".join(literal)))
    return "".join(out)


def joda_to_jdk(fmt: str) -> str:
    out: list[str] = []
    i = 0
    in_quote = False
    while i < len(fmt):
        ch = fmt[i]
        if ch == "'":
            in_quote = not in_quote
            out.append(ch)
            i += 1
            continue
        if in_quote:
            out.append(ch)
            i += 1
            continue
        if fmt.startswith("ZZ", i):
            out.append(_JODA_TO_JDK["ZZ"])
            i += 2
            continue
        if ch in _JODA_TO_JDK:
            out.append(_JODA_TO_JDK[ch])
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def presto_date_format(col: Column, mysql_fmt: str) -> Column:
    """Presto date_format(timestamp, '%Y-%m-%d') semantics."""
    return F.date_format(col, mysql_to_jdk(mysql_fmt))


def presto_date_parse(col: Column, mysql_fmt: str) -> Column:
    """Presto date_parse(string, '%Y-%m-%d') semantics."""
    return F.to_timestamp(col, mysql_to_jdk(mysql_fmt))


def format_datetime(col: Column, joda_fmt: str) -> Column:
    """Presto format_datetime(timestamp, Joda pattern) semantics."""
    return F.date_format(col, joda_to_jdk(joda_fmt))


def parse_datetime(col: Column, joda_fmt: str) -> Column:
    """Presto parse_datetime(string, Joda pattern) semantics."""
    return F.to_timestamp(col, joda_to_jdk(joda_fmt))
