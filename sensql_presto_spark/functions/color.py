"""Presto color functions (ColorFunctions.java) — CLI visualization surface.

Reference: presto-main/.../operator/scalar/ColorFunctions.java (color:88-105,
rgb:108-116, interpolated color:126-155, render:157-196, bar:198-232,
interpolate:234-245, toAnsi:250-258,266-275, parseRgb:279-300) and
type/ColorType.java (the color type is a plain long: non-negative = packed
24-bit RGB, negative = -(ansi_index+1) for the 8 system colors).

Spark mapping: the color *type* is BIGINT; `color`/`rgb`/`render`/`bar` are
SQL temp functions (Catalyst-inlined — the ANSI-index math `c*6/256` is
exact integer arithmetic, so the DuckDB oracle matches bit-for-bit).  The
HSB-space gradient (`color(fraction, low, high)` and bar's per-cell
interpolation) is the one genuinely non-expressible piece — it ports JDK
``Color.RGBtoHSB``/``HSBtoRGB`` float semantics — and runs as
Arrow-vectorized pandas UDFs (``color_interp``, ``bar_gradient``).  These
are client-rendering helpers, never a 100 TB hot path.

Arity overloads collapse to distinct names (Spark temp functions don't
overload): ``render(value, color)`` takes the string form (numbers cast),
``render_bool(b)`` is the boolean check/cross form, ``bar(pct, width)``
defaults to the red→green gradient of the reference's 2-arg overload.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANSI_RESET = "[0m"

_SYSTEM_COLORS = (
    "black",
    "red",
    "green",
    "yellow",
    "blue",
    "magenta",
    "cyan",
    "white",
)


# --- exact ports of java.awt.Color HSB conversions ---------------------------
# Java computes these in FLOAT32; sector selection in HSBtoRGB truncates
# (int) h*6, so float64 would land some hues in the wrong sector (e.g.
# magenta: hue*6 = 4.9999995f in float32 vs 5.0000000000000001 in float64)
# and produce a visibly different ANSI cell. numpy.float32 reproduces the
# reference bit-for-bit (verified against TestColorFunctions.java goldens).

import numpy as np

_F32 = np.float32


def _rgb_to_hsb(r: int, g: int, b: int) -> tuple:
    cmax = max(r, g, b)
    cmin = min(r, g, b)
    brightness = _F32(cmax) / _F32(255.0)
    saturation = _F32(0.0) if cmax == 0 else _F32(cmax - cmin) / _F32(cmax)
    if saturation == 0.0:
        hue = _F32(0.0)
    else:
        redc = _F32(cmax - r) / _F32(cmax - cmin)
        greenc = _F32(cmax - g) / _F32(cmax - cmin)
        bluec = _F32(cmax - b) / _F32(cmax - cmin)
        if r == cmax:
            hue = bluec - greenc
        elif g == cmax:
            hue = _F32(2.0) + redc - bluec
        else:
            hue = _F32(4.0) + greenc - redc
        hue = hue / _F32(6.0)
        if hue < 0.0:
            hue = hue + _F32(1.0)
    return hue, saturation, brightness


def _hsb_to_rgb(h, s, v) -> int:
    h, s, v = _F32(h), _F32(s), _F32(v)
    if s == 0.0:
        r = g = b = int(v * _F32(255.0) + _F32(0.5))
    else:
        h6 = (h - _F32(math.floor(h))) * _F32(6.0)
        f = h6 - _F32(math.floor(h6))
        p = v * (_F32(1.0) - s)
        q = v * (_F32(1.0) - s * f)
        t = v * (_F32(1.0) - s * (_F32(1.0) - f))
        sector = int(h6)
        vv, tt, pp, qq = (
            int(v * _F32(255.0) + _F32(0.5)),
            int(t * _F32(255.0) + _F32(0.5)),
            int(p * _F32(255.0) + _F32(0.5)),
            int(q * _F32(255.0) + _F32(0.5)),
        )
        r, g, b = [
            (vv, tt, pp),
            (qq, vv, pp),
            (pp, vv, tt),
            (pp, qq, vv),
            (tt, pp, vv),
            (vv, pp, qq),
        ][sector % 6]
    return (r << 16) | (g << 8) | b


def interpolate(fraction: float, low_rgb: int, high_rgb: int) -> int:
    """ColorFunctions.interpolate: linear blend in HSB space (float32)."""
    frac = _F32(fraction)
    lh, ls, lv = _rgb_to_hsb((low_rgb >> 16) & 255, (low_rgb >> 8) & 255, low_rgb & 255)
    hh, hs, hv = _rgb_to_hsb((high_rgb >> 16) & 255, (high_rgb >> 8) & 255, high_rgb & 255)
    h = frac * (hh - lh) + lh
    s = frac * (hs - ls) + ls
    v = frac * (hv - lv) + lv
    return _hsb_to_rgb(h, s, v) & 0xFFFFFF


def to_ansi(color: int) -> int:
    """ColorFunctions.toAnsi: RGB → 216-color-cube index; system colors pass through."""
    if color >= 0:
        r = ((color >> 16) & 255) * 6 // 256
        g = ((color >> 8) & 255) * 6 // 256
        b = (color & 255) * 6 // 256
        return 16 + r * 36 + g * 6 + b
    return int(-color - 1)


def _escape(color: int) -> str:
    return f"[38;5;{to_ansi(color)}m"


def bar_str(percent: float, width: int, low: int, high: int) -> str:
    """ColorFunctions.bar: gradient block bar, space-padded to width."""
    count = int(percent * width)
    count = max(0, min(width, count))
    parts = []
    for i in range(count):
        # width=1 divides 0/0 in the reference (Java NaN); pin to 0.0 (low
        # color) instead of propagating NaN through the HSB blend
        fraction = i * 1.0 / (width - 1) if width > 1 else 0.0
        parts.append(_escape(interpolate(fraction, low, high)))
        parts.append("█")
    parts.append(ANSI_RESET)
    parts.append(" " * (width - count))
    return "".join(parts)


# --- Arrow-vectorized UDFs for the HSB pieces -------------------------------


@F.pandas_udf(T.LongType())
def color_interp(fraction: pd.Series, low: pd.Series, high: pd.Series) -> pd.Series:
    """color(fraction, lowColor, highColor): clamped HSB interpolation."""

    def one(f, lo, hi):
        if f is None or lo is None or hi is None:
            return None
        if lo < 0 or hi < 0:
            raise ValueError("lowColor/highColor not a valid RGB color")
        return interpolate(min(1.0, max(0.0, float(f))), int(lo), int(hi))

    return pd.Series(
        [one(f, lo, hi) for f, lo, hi in zip(fraction, low, high)], dtype="object"
    )


@F.pandas_udf(T.StringType())
def bar_gradient(
    percent: pd.Series, width: pd.Series, low: pd.Series, high: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            None
            if p is None or w is None
            else bar_str(float(p), int(w), int(lo), int(hi))
            for p, w, lo, hi in zip(percent, width, low, high)
        ]
    )


# --- SQL temp functions (Catalyst-inlined, exact integer ANSI math) ---------

_COLOR_SQL: tuple[str, ...] = (
    # color('#rgb') -> packed 24-bit RGB with CSS nibble replication
    # (parseRgb:279-300); named system colors -> -(index+1) (color:88-105);
    # anything else raises like Presto's INVALID_FUNCTION_ARGUMENT.
    """CREATE OR REPLACE TEMPORARY FUNCTION color(s STRING)
       RETURNS BIGINT RETURN
       CASE
         WHEN s RLIKE '^#[0-9a-fA-F]{3}$' THEN
              cast(conv(substring(s, 2, 1), 16, 10) AS BIGINT) * 17 * 65536
            + cast(conv(substring(s, 3, 1), 16, 10) AS BIGINT) * 17 * 256
            + cast(conv(substring(s, 4, 1), 16, 10) AS BIGINT) * 17
         WHEN lower(s) = 'black'   THEN -1
         WHEN lower(s) = 'red'     THEN -2
         WHEN lower(s) = 'green'   THEN -3
         WHEN lower(s) = 'yellow'  THEN -4
         WHEN lower(s) = 'blue'    THEN -5
         WHEN lower(s) = 'magenta' THEN -6
         WHEN lower(s) = 'cyan'    THEN -7
         WHEN lower(s) = 'white'   THEN -8
         ELSE cast(raise_error(concat('Invalid color: ''', s, '''')) AS BIGINT)
       END""",
    # rgb(r,g,b) with the reference's 0-255 range checks (rgb:108-116)
    """CREATE OR REPLACE TEMPORARY FUNCTION rgb(r BIGINT, g BIGINT, b BIGINT)
       RETURNS BIGINT RETURN
       CASE
         WHEN r < 0 OR r > 255 THEN cast(raise_error('red must be between 0 and 255') AS BIGINT)
         WHEN g < 0 OR g > 255 THEN cast(raise_error('green must be between 0 and 255') AS BIGINT)
         WHEN b < 0 OR b > 255 THEN cast(raise_error('blue must be between 0 and 255') AS BIGINT)
         ELSE r * 65536 + g * 256 + b
       END""",
    # toAnsi (toAnsi:250-275): exact integer rescale to the 6x6x6 cube
    """CREATE OR REPLACE TEMPORARY FUNCTION color_to_ansi(c BIGINT)
       RETURNS BIGINT RETURN
       CASE WHEN c >= 0 THEN
              16 + ((c DIV 65536) % 256) * 6 DIV 256 * 36
                 + ((c DIV 256) % 256) * 6 DIV 256 * 6
                 + (c % 256) * 6 DIV 256
            ELSE -c - 1
       END""",
    # render(value, color) (render:157-175): ESC[38;5;<ansi>m value ESC[0m
    """CREATE OR REPLACE TEMPORARY FUNCTION render(s STRING, c BIGINT)
       RETURNS STRING RETURN
       concat(char(27), '[38;5;',
              cast(CASE WHEN c >= 0 THEN
                          16 + ((c DIV 65536) % 256) * 6 DIV 256 * 36
                             + ((c DIV 256) % 256) * 6 DIV 256 * 6
                             + (c % 256) * 6 DIV 256
                        ELSE -c - 1 END AS STRING),
              'm', s, char(27), '[0m')""",
    # render(boolean) (render:191-196): green check / red cross
    """CREATE OR REPLACE TEMPORARY FUNCTION render_bool(b BOOLEAN)
       RETURNS STRING RETURN
       IF(b, concat(char(27), '[38;5;2m', '✓', char(27), '[0m'),
             concat(char(27), '[38;5;1m', '✗', char(27), '[0m'))""",
    # bar(pct, width) 2-arg overload (bar:198-203): red -> green gradient
    """CREATE OR REPLACE TEMPORARY FUNCTION bar(pct DOUBLE, width BIGINT)
       RETURNS STRING RETURN bar_gradient(pct, width, 16711680L, 65280L)""",
)


def register_color_functions(spark: SparkSession) -> None:
    spark.udf.register("color_interp", color_interp)
    spark.udf.register("bar_gradient", bar_gradient)
    for ddl in _COLOR_SQL:
        spark.sql(ddl)
