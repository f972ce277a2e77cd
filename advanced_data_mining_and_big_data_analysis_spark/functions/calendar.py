"""Calendar / time-series feature builders.

The heart of the reference notebook is calendar feature generation
(reference kaggle/kaggle.py:193-331): date parts, season buckets, weekday
flags, Fourier harmonics, holiday indicator families, and anchor-relative
windows (Easter, nth-weekday-of-month). All are pure Column expressions —
JVM-side, whole-stage-codegen'd, no UDFs — so they cost the same as any
built-in projection at 100 TB.
"""

from __future__ import annotations

import datetime as _dt
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Date parts (kaggle.py:203-214 dt.month/.day/.weekday/.dayofyear/.year)
# ---------------------------------------------------------------------------


def calendar_parts(dt: Column | str) -> dict[str, Column]:
    """All date parts the reference extracts, pandas-compatible semantics
    (``weekday``: Monday=0 like pandas ``dt.weekday``)."""
    c = F.col(dt) if isinstance(dt, str) else dt
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "weekday": F.weekday(c),  # Monday=0 .. Sunday=6
        "dayofyear": F.dayofyear(c),
    }


def season(dt: Column | str) -> Column:
    """Meteorological season label (kaggle.py:203):
    ``((month % 12 + 3) // 3).map({1:'DJF',2:'MAM',3:'JJA',4:'SON'})``."""
    c = F.col(dt) if isinstance(dt, str) else dt
    idx = F.floor((F.month(c) % 12 + 3) / 3).cast("int")
    return F.element_at(F.array(F.lit("DJF"), F.lit("MAM"), F.lit("JJA"), F.lit("SON")), idx)


def weekday_flags(dt: Column | str) -> dict[str, Column]:
    """Friday / weekend indicators (kaggle.py:206-209)."""
    c = F.col(dt) if isinstance(dt, str) else dt
    wd = F.weekday(c)
    return {"wd4": wd == 4, "wd56": wd >= 5}


# ---------------------------------------------------------------------------
# Fourier features (kaggle.py:183-192, 214-234)
# ---------------------------------------------------------------------------


def fourier_doy(dt: Column | str, order: int, period: float = 365.0) -> dict[str, Column]:
    """Day-of-year harmonics: sin/cos(dayofyear / period * 2πk) for
    k = 1..order (kaggle.py:214-234). Pure trig on a projected column."""
    c = F.col(dt) if isinstance(dt, str) else dt
    doy = F.dayofyear(c)
    out: dict[str, Column] = {}
    for k in range(1, order + 1):
        theta = doy / F.lit(period) * 2 * math.pi * k
        out[f"sin{k}"] = F.sin(theta)
        out[f"cos{k}"] = F.cos(theta)
    return out


def fourier_positional(t: Column, freq: float, order: int) -> dict[str, Column]:
    """Positional-index harmonics (kaggle.py:183-192): sin/cos(2π·k·t/freq)
    where ``t`` is a 0-based position (e.g. ``row_number().over(w) - 1``)."""
    out: dict[str, Column] = {}
    for k in range(1, order + 1):
        theta = 2 * math.pi * t * k / F.lit(freq)
        out[f"psin{k}"] = F.sin(theta)
        out[f"pcos{k}"] = F.cos(theta)
    return out


# ---------------------------------------------------------------------------
# Holiday indicator families (kaggle.py:248-329)
# ---------------------------------------------------------------------------


def month_day_flag(dt: Column | str, month: int, days: tuple[int, int]) -> Column:
    """Fixed-calendar-window indicator, e.g. Dec 24-31 (kaggle.py:248-252)."""
    c = F.col(dt) if isinstance(dt, str) else dt
    return (F.month(c) == month) & F.dayofmonth(c).between(days[0], days[1])


def anchor_window_flag(dt: Column | str, anchor: Column, window: tuple[int, int]) -> Column:
    """Anchor-relative indicator: datediff(dt, anchor) ∈ [lo, hi] — the
    reference's ``(df.date - easter_date) == timedelta(d)`` families
    (kaggle.py:296-329), one datediff instead of a per-day equality scan."""
    c = F.col(dt) if isinstance(dt, str) else dt
    return F.datediff(c, anchor).between(window[0], window[1])


def easter_date(year: int) -> _dt.date:
    """Gregorian Easter Sunday (Anonymous Gregorian algorithm — public
    domain arithmetic; replaces the reference's dateutil.easter call,
    kaggle.py:326)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    g = (8 * b + 13) // 25
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7  # noqa: E741
    m = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * m + 114) // 31
    day = (h + l - 7 * m + 114) % 31 + 1
    return _dt.date(year, month, day)


def easter_dim(spark: SparkSession, years: list[int]) -> DataFrame:
    """Per-year anchor dim table (driver-side materialization, broadcast
    at join time — SURVEY §4 custom-work item 3)."""
    rows = [(y, easter_date(y)) for y in years]
    return spark.createDataFrame(rows, "year int, easter date")


def with_easter_anchor(df: DataFrame, dt_col: str, spark: SparkSession, years: list[int]) -> DataFrame:
    """Broadcast-join the easter anchor onto a fact by calendar year."""
    dim = easter_dim(spark, years)
    return df.withColumn("_year", F.year(dt_col)).join(
        F.broadcast(dim), F.col("_year") == dim.year, "left"
    ).drop("_year", "year")


# ---------------------------------------------------------------------------
# Holiday calendar dim (kaggle.py:332-333, 800-803: the `holidays` package
# materialized as a (country, date, holiday) table, broadcast at join time).
# Fixed-date rules plus Easter-relative moveable feasts for the three
# countries the reference models; extend per-country as needed.
# ---------------------------------------------------------------------------

_FIXED_HOLIDAYS: dict[str, list[tuple[int, int, str]]] = {
    "Finland": [(1, 1, "New Year"), (1, 6, "Epiphany"), (5, 1, "May Day"),
                (12, 6, "Independence Day"),
                (12, 24, "Christmas Eve"), (12, 25, "Christmas Day"), (12, 26, "Boxing Day")],
    "Norway": [(1, 1, "New Year"), (5, 1, "Labour Day"), (5, 17, "Constitution Day"),
               (12, 25, "Christmas Day"), (12, 26, "Boxing Day")],
    "Sweden": [(1, 1, "New Year"), (1, 6, "Epiphany"), (5, 1, "May Day"),
               (6, 6, "National Day"),
               (12, 24, "Christmas Eve"), (12, 25, "Christmas Day"), (12, 26, "Boxing Day")],
}

# days relative to Easter Sunday, observed across all three countries
_EASTER_RELATIVE = [(-2, "Good Friday"), (0, "Easter Sunday"), (1, "Easter Monday"),
                    (39, "Ascension Day"), (49, "Whit Sunday")]

# countries with a Midsummer Eve rule (Friday between Jun 19 and Jun 25)
_MIDSUMMER_COUNTRIES = ("Finland", "Sweden")


def midsummer_eve(year: int) -> _dt.date:
    """Friday between June 19 and 25 — the Finnish/Swedish weekday rule."""
    d = _dt.date(year, 6, 19)
    return d + _dt.timedelta(days=(4 - d.weekday()) % 7)


def observed_date(d: _dt.date) -> _dt.date | None:
    """The `holidays`-package ``observed=True`` shift: a fixed-date
    holiday falling on a weekend ADDS an observed day on the following
    Monday (Sat +2, Sun +1); weekday holidays add nothing."""
    if d.weekday() == 5:
        return d + _dt.timedelta(days=2)
    if d.weekday() == 6:
        return d + _dt.timedelta(days=1)
    return None


def fixed_holiday_rows(years: list[int], countries: list[str] | None = None) -> list[tuple[str, _dt.date, str]]:
    """Fixed-calendar-date rows only (the rows observed-shifting applies to)."""
    countries = countries or list(_FIXED_HOLIDAYS)
    return [
        (country, _dt.date(y, m, d), name)
        for country in countries
        for y in years
        for m, d, name in _FIXED_HOLIDAYS[country]
    ]


def moveable_holiday_rows(years: list[int], countries: list[str] | None = None) -> list[tuple[str, _dt.date, str]]:
    """Weekday-anchored rows (Easter-relative feasts, Midsummer Eve) —
    never weekend-shifted because their rules already pin the weekday."""
    countries = countries or list(_FIXED_HOLIDAYS)
    rows: list[tuple[str, _dt.date, str]] = []
    for country in countries:
        for y in years:
            e = easter_date(y)
            for off, name in _EASTER_RELATIVE:
                rows.append((country, e + _dt.timedelta(days=off), name))
            if country in _MIDSUMMER_COUNTRIES:
                rows.append((country, midsummer_eve(y), "Midsummer Eve"))
    return rows


def holiday_rows(
    years: list[int], countries: list[str] | None = None, observed: bool = False
) -> list[tuple[str, _dt.date, str]]:
    """Driver-side (country, date, holiday) rows — tiny by construction.

    ``observed=True`` reproduces ``holidays.CountryHoliday(observed=True)``
    (reference kaggle.py:332-333): weekend fixed-date holidays gain an
    extra "<name> (observed)" entry on the following Monday."""
    fixed = fixed_holiday_rows(years, countries)
    rows = fixed + moveable_holiday_rows(years, countries)
    if observed:
        for country, d, name in fixed:
            shifted = observed_date(d)
            if shifted is not None:
                rows.append((country, shifted, f"{name} (observed)"))
    return rows


def holiday_dim(
    spark: SparkSession,
    years: list[int],
    countries: list[str] | None = None,
    observed: bool = False,
) -> DataFrame:
    """Holiday dim table for broadcast joins (SURVEY §2.5 holiday source)."""
    return spark.createDataFrame(
        holiday_rows(years, countries, observed), "country string, date date, holiday string"
    )


# ---------------------------------------------------------------------------
# Date-range generation (kaggle.py:472-476 pd.date_range scoring frame)
# ---------------------------------------------------------------------------


def date_range_df(spark: SparkSession, start: str, end: str, col_name: str = "date") -> DataFrame:
    """Distributed date spine: sequence + explode (no driver-side loop)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
            )
        ).alias(col_name)
    )
