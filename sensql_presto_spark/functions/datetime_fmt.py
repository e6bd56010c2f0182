"""Datetime format-string shims: MySQL-% (Presto date_format/date_parse) and
Joda (Presto format_datetime/parse_datetime) → JDK DateTimeFormatter patterns.

The reference's DateTimeFunctions.java exposes both families; Spark's
date_format/to_timestamp speak JDK patterns only (SURVEY.md §2.8 "needs a
format-string translation shim"). Translation happens driver-side on the
(almost always literal) pattern, so execution stays JVM-native.

Week-based fields are special: Spark 3+ rejects the JDK week letters
(Y/w/e) outright, so MySQL %v/%x and Joda x/w/e can't be translated to a
pattern string at all. ``presto_date_format``/``format_datetime`` instead
splice those fields in as column expressions (weekofyear + an ISO-weekyear
CASE), concatenated with date_format segments for the rest — still fully
JVM-side. The *parse* direction has no Spark equivalent for week fields and
raises a clear error.
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
    "W": "EEEE",
    "Y": "yyyy",
    "y": "yy",
    "%": "%",
}

# Week-based MySQL specifiers → expression builders (no JDK letter works).
# %v = ISO-8601 week number (used with %x), %x = ISO-8601 week-year.
_MYSQL_WEEK = {"v", "x"}
# Sunday-based / mode-variant week numbers the engine does not support.
_MYSQL_UNSUPPORTED = {"U", "u", "V", "X"}

# Joda tokens that differ from JDK; all others pass through.
_JODA_TO_JDK: dict[str, str] = {
    "Y": "y",  # Joda year-of-era -> JDK y
    "ZZ": "xxx",
    "Z": "xx",
}

# Joda week-based tokens → expression builders (Spark rejects Y/w/e letters).
_JODA_WEEK = {"x", "w", "e"}


def _iso_week(col: Column, width: int = 2) -> Column:
    return F.lpad(F.weekofyear(col).cast("string"), width, "0")


def _iso_weekyear(col: Column, width: int = 4) -> Column:
    # ISO week-year: the year that owns the ISO week — differs from the
    # calendar year only in the first/last days of January/December.
    wy = (
        F.when((F.weekofyear(col) == 1) & (F.month(col) == 12), F.year(col) + 1)
        .when((F.weekofyear(col) >= 52) & (F.month(col) == 1), F.year(col) - 1)
        .otherwise(F.year(col))
    )
    return F.lpad(wy.cast("string"), width, "0")


def _iso_dayofweek(col: Column) -> Column:
    # Joda 'e': ISO day-of-week number, Monday=1..Sunday=7.
    # Spark dayofweek: Sunday=1..Saturday=7.
    return (((F.dayofweek(col) + 5) % 7) + 1).cast("string")


def _quote_literal(text: str) -> str:
    """Quote a literal run for a JDK pattern (letters are pattern chars)."""
    if not text:
        return ""
    if any(c.isalpha() for c in text) or "'" in text:
        return "'" + text.replace("'", "''") + "'"
    return text


# --- MySQL-% family ---------------------------------------------------------


def _mysql_segments(fmt: str) -> list[tuple[str, str]]:
    """Tokenize a MySQL pattern into ('jdk', pattern) / ('week', spec) runs."""
    segs: list[tuple[str, str]] = []
    jdk: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            jdk.append(_quote_literal("".join(literal)))
            literal.clear()

    def flush_jdk() -> None:
        flush_literal()
        if jdk:
            segs.append(("jdk", "".join(jdk)))
            jdk.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec == "%":
                literal.append("%")
            elif spec in _MYSQL_WEEK:
                flush_jdk()
                segs.append(("week", spec))
            elif spec in _MYSQL_UNSUPPORTED:
                raise ValueError(
                    f"unsupported MySQL datetime specifier %{spec} "
                    "(Sunday-based/mode-variant week numbers)"
                )
            elif spec in _MYSQL_TO_JDK:
                flush_literal()
                jdk.append(_MYSQL_TO_JDK[spec])
            else:
                literal.append(spec)
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush_jdk()
    return segs


def mysql_to_jdk(fmt: str) -> str:
    segs = _mysql_segments(fmt)
    if any(kind != "jdk" for kind, _ in segs):
        raise ValueError(
            f"MySQL pattern {fmt!r} uses week-based %v/%x, which has no JDK "
            "pattern letter Spark accepts; presto_date_format() handles it "
            "as a weekofyear()/ISO-weekyear expression instead"
        )
    return "".join(p for _, p in segs)


def presto_date_format(col: Column, mysql_fmt: str) -> Column:
    """Presto date_format(timestamp, '%Y-%m-%d') semantics.

    Week-based %v/%x are spliced in as expressions (see module docstring);
    everything else is a single JVM-native date_format.
    """
    segs = _mysql_segments(mysql_fmt)
    if all(kind == "jdk" for kind, _ in segs):
        return F.date_format(col, "".join(p for _, p in segs))
    cols: list[Column] = []
    for kind, payload in segs:
        if kind == "jdk":
            cols.append(F.date_format(col, payload))
        elif payload == "v":
            cols.append(_iso_week(col))
        else:  # 'x'
            cols.append(_iso_weekyear(col))
    return F.concat(*cols)


def presto_date_parse(col: Column, mysql_fmt: str) -> Column:
    """Presto date_parse(string, '%Y-%m-%d') semantics."""
    segs = _mysql_segments(mysql_fmt)
    if any(kind != "jdk" for kind, _ in segs):
        raise ValueError(
            f"cannot parse week-based MySQL specifiers in {mysql_fmt!r}: "
            "Spark has no week-field parser"
        )
    return F.to_timestamp(col, "".join(p for _, p in segs))


# --- Joda family ------------------------------------------------------------


def _joda_segments(fmt: str) -> list[tuple[str, str]]:
    """Tokenize a Joda pattern into ('jdk', pattern) / ('week', token) runs.

    Week tokens record the full run (e.g. 'xxxx') so padding width survives.
    """
    segs: list[tuple[str, str]] = []
    jdk: list[str] = []
    i = 0
    in_quote = False

    def flush_jdk() -> None:
        if jdk:
            segs.append(("jdk", "".join(jdk)))
            jdk.clear()

    while i < len(fmt):
        ch = fmt[i]
        if ch == "'":
            in_quote = not in_quote
            jdk.append(ch)
            i += 1
            continue
        if in_quote:
            jdk.append(ch)
            i += 1
            continue
        if fmt.startswith("ZZ", i):
            jdk.append(_JODA_TO_JDK["ZZ"])
            i += 2
            continue
        if ch in _JODA_WEEK:
            j = i
            while j < len(fmt) and fmt[j] == ch:
                j += 1
            flush_jdk()
            segs.append(("week", fmt[i:j]))
            i = j
            continue
        if ch in _JODA_TO_JDK:
            jdk.append(_JODA_TO_JDK[ch])
            i += 1
            continue
        jdk.append(ch)
        i += 1
    flush_jdk()
    return segs


def joda_to_jdk(fmt: str) -> str:
    segs = _joda_segments(fmt)
    if any(kind != "jdk" for kind, _ in segs):
        raise ValueError(
            f"Joda pattern {fmt!r} uses week-based x/w/e, which Spark rejects "
            "as pattern letters; format_datetime() handles them as "
            "weekofyear()/ISO-weekyear/day-of-week expressions instead"
        )
    return "".join(p for _, p in segs)


def format_datetime(col: Column, joda_fmt: str) -> Column:
    """Presto format_datetime(timestamp, Joda pattern) semantics.

    Week-based x (weekyear), w (week-of-weekyear) and e (ISO day-of-week)
    are spliced in as expressions; the rest is JVM-native date_format.
    """
    segs = _joda_segments(joda_fmt)
    if all(kind == "jdk" for kind, _ in segs):
        return F.date_format(col, "".join(p for _, p in segs))
    cols: list[Column] = []
    for kind, payload in segs:
        if kind == "jdk":
            cols.append(F.date_format(col, payload))
        elif payload[0] == "x":
            cols.append(_iso_weekyear(col, width=max(4, len(payload))))
        elif payload[0] == "w":
            cols.append(_iso_week(col, width=max(1, len(payload))))
        else:  # 'e'
            cols.append(_iso_dayofweek(col))
    return F.concat(*cols)


def parse_datetime(col: Column, joda_fmt: str) -> Column:
    """Presto parse_datetime(string, Joda pattern) semantics."""
    segs = _joda_segments(joda_fmt)
    if any(kind != "jdk" for kind, _ in segs):
        raise ValueError(
            f"cannot parse week-based Joda tokens in {joda_fmt!r}: "
            "Spark has no week-field parser"
        )
    return F.to_timestamp(col, "".join(p for _, p in segs))
