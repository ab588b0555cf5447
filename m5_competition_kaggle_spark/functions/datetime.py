"""Date/time scalar functions (SURVEY §2 F3–F7) with pandas conventions.

The reference derives time features with pandas ``Series.dt`` accessors
(reference ``utils.py:10-23``) whose day-of-week convention (Mon=0…Sun=6)
differs from Spark's ``dayofweek`` (Sun=1…Sat=7). These helpers pin the
pandas convention so feature values are bit-identical (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dayofweek_pandas(col: Column | str) -> Column:
    """pandas ``dt.dayofweek``: Monday=0 … Sunday=6.

    Spark ``dayofweek`` is Sunday=1 … Saturday=7, so shift by +5 mod 7.
    """
    return ((F.dayofweek(col) + F.lit(5)) % 7).cast("int")


def is_weekend(col: Column | str) -> Column:
    """``dayofweek.isin([5, 6])`` — Saturday/Sunday in the pandas
    convention (reference ``utils.py:23``)."""
    return dayofweek_pandas(col).isin(5, 6).cast("int")


def quarter(col: Column | str) -> Column:
    return F.quarter(col).cast("int")


def weekofyear(col: Column | str) -> Column:
    """ISO week number — matches pandas ``dt.isocalendar().week`` /
    deprecated ``dt.week`` (reference ``utils.py:13``)."""
    return F.weekofyear(col).cast("int")


def dayofmonth(col: Column | str) -> Column:
    return F.dayofmonth(col).cast("int")


def add_days(col: Column | str, days: int) -> Column:
    """F6 — ``date + np.timedelta64(k, 'D')`` (``pipeline.py:289-291``)."""
    return F.date_add(col, days)


def day_index_from(col: Column | str, origin: Column) -> Column:
    """F7 — ``(d − min_d + 1 day) / 1 day`` → 1-based day ordinal
    (``pipeline.py:369-372``)."""
    return (F.datediff(col, origin) + F.lit(1)).cast("long")


def time_features(df, date_col: str, prefix: str = ""):
    """Attach the reference's time-feature block (``utils.py:10-23``):
    quarter, week, day-of-month, day-of-week (pandas convention), weekend."""
    return df.withColumns(
        {
            f"{prefix}quarter": quarter(date_col),
            f"{prefix}week": weekofyear(date_col),
            f"{prefix}day": dayofmonth(date_col),
            f"{prefix}dayofweek": dayofweek_pandas(date_col),
            f"{prefix}is_weekend": is_weekend(date_col),
        }
    )
