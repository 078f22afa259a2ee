"""Temporal functions (reference ``Temporal``, inputs.py:450-487).

Spark has no TIME type; ``time_of_day`` returns microseconds-since-midnight
as a long (the engine's documented representation, SURVEY §1.2), with
``time_string`` for the ISO display form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "date", "day", "day_of_year", "delta", "epoch_seconds", "hour",
    "microsecond", "millisecond", "minute", "month", "quarter", "second",
    "strftime", "time_of_day", "time_string", "truncate", "week_of_year",
    "year",
]

date = F.to_date
day = F.dayofmonth
day_of_year = F.dayofyear
hour, minute, second = F.hour, F.minute, F.second
month, quarter, year = F.month, F.quarter, F.year
week_of_year = F.weekofyear


def epoch_seconds(col: Column) -> Column:
    return F.unix_timestamp(col)


def microsecond(col: Column) -> Column:
    return (F.unix_micros(col) % 1_000_000).cast("int")


def millisecond(col: Column) -> Column:
    return ((F.unix_micros(col) % 1_000_000) / 1000).cast("int")


def strftime(col: Column, fmt: str = "%Y-%m-%dT%H:%M:%S") -> Column:
    """C-style format translated to Spark's java.time pattern."""
    mapping = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%y": "yy", "%j": "DDD", "%A": "EEEE", "%B": "MMMM",
    }
    for c_fmt, j_fmt in mapping.items():
        fmt = fmt.replace(c_fmt, j_fmt)
    return F.date_format(col, fmt.replace("T", "'T'"))


def truncate(col: Column, unit: str) -> Column:
    """Truncate to unit: year|quarter|month|week|day|hour|minute|second."""
    return F.date_trunc(unit, col)


def delta(start: Column, end: Column, unit: str = "second") -> Column:
    """Whole-unit difference ``end - start`` (reference ibis ``delta``)."""
    return F.timestamp_diff(unit, start, end)


def time_of_day(col: Column) -> Column:
    """Microseconds since midnight (Spark-native TIME representation)."""
    return F.unix_micros(col) - F.unix_micros(F.date_trunc("day", col))


def time_string(col: Column) -> Column:
    return F.date_format(col, "HH:mm:ss.SSSSSS")


def micros_to_time(col: Column) -> Column:
    """µs-since-midnight (the parquet TIME(MICROS) physical value, read as
    long) → Spark TIME. Spark 4.1 has a native TimeType but cannot yet scan
    parquet TIME columns, so stored time-of-day arrives as int64 and this
    is the decode step (reference Time column, scalars.py:76)."""
    return F.make_time(
        (col / 3_600_000_000).cast("int"),
        ((col % 3_600_000_000) / 60_000_000).cast("int"),
        (col % 60_000_000) / F.lit(1_000_000.0),
    )


def time_to_micros(col: Column) -> Column:
    """Spark TIME → µs-since-midnight long (the storage encoding).
    ``extract(SECOND)`` yields decimal seconds including the fraction."""
    return (
        F.hour(col).cast("long") * 3_600_000_000
        + F.minute(col).cast("long") * 60_000_000
        + (F.extract(F.lit("SECOND"), col) * 1_000_000).cast("long")
    )
