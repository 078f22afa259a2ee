"""GraphQL scalars + Spark↔GraphQL type mapping.

Mirrors the reference's scalar registry (reference scalars.py:19-111):
GraphQL ``Int`` is 32-bit, so ``LongType`` gets a custom ``BigInt``;
``Decimal`` serializes as a string; date/time types serialize ISO;
``BinaryType`` is base64; structs serialize as JSON objects.
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
from typing import Any

from graphql import (
    GraphQLBoolean,
    GraphQLFloat,
    GraphQLInt,
    GraphQLScalarType,
    GraphQLString,
)
from pyspark.sql import types as T

_INT32 = 2**31


def _serialize_big_int(value: Any) -> int:
    return int(value)


def _parse_big_int(value: Any) -> int:
    if not isinstance(value, int) or isinstance(value, bool):
        raise ValueError(f"BigInt cannot represent {value!r}")
    return value


BigInt = GraphQLScalarType(
    name="BigInt",
    description="64-bit integer (GraphQL Int is 32-bit; reference scalars.py:19-22)",
    serialize=_serialize_big_int,
    parse_value=_parse_big_int,
)

Decimal = GraphQLScalarType(
    name="Decimal",
    description="arbitrary-precision decimal, string-serialized",
    serialize=lambda v: str(v),
    parse_value=lambda v: decimal.Decimal(str(v)),
)

Date = GraphQLScalarType(
    name="Date",
    description="ISO-8601 date",
    serialize=lambda v: v.isoformat() if isinstance(v, dt.date) else str(v),
    parse_value=lambda v: dt.date.fromisoformat(v),
)

Datetime = GraphQLScalarType(
    name="Datetime",
    description="ISO-8601 timestamp",
    serialize=lambda v: v.isoformat() if isinstance(v, (dt.datetime, dt.date)) else str(v),
    parse_value=lambda v: dt.datetime.fromisoformat(v),
)

Time = GraphQLScalarType(
    name="Time",
    description="ISO-8601 time of day (reference scalars.py:76; Spark 4.1 "
    "native TIME, µs precision)",
    serialize=lambda v: v.isoformat() if isinstance(v, dt.time) else str(v),
    parse_value=lambda v: dt.time.fromisoformat(v),
)

Duration = GraphQLScalarType(
    name="Duration",
    description="ISO-8601 duration (reference scalars.py:25-42)",
    serialize=lambda v: _duration_isoformat(v),
    parse_value=lambda v: parse_duration(v),
)

Base64 = GraphQLScalarType(
    name="Base64",
    description="base64-encoded binary",
    serialize=lambda v: base64.b64encode(bytes(v)).decode(),
    parse_value=lambda v: base64.b64decode(v),
)


def _serialize_json(value: Any) -> Any:
    if isinstance(value, (dt.date, dt.datetime)):
        return value.isoformat()
    if isinstance(value, decimal.Decimal):
        return str(value)
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode()
    if isinstance(value, dict):
        return {k: _serialize_json(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_serialize_json(v) for v in value]
    return value


JSON = GraphQLScalarType(
    name="JSON",
    description="arbitrary JSON value (structs, untyped literals)",
    serialize=_serialize_json,
    parse_value=lambda v: v,
)


def _duration_isoformat(value: Any) -> str:
    if isinstance(value, dt.timedelta):
        days, seconds, micros = value.days, value.seconds, value.microseconds
        frac = f".{micros:06d}".rstrip("0") if micros else ""
        return f"P{days}DT{seconds}{frac}S"
    return str(value)


def parse_duration(text: str) -> dt.timedelta:
    """Parse a (day-time) ISO-8601 duration: PnDTnHnMn.nS."""
    import re

    m = re.fullmatch(
        r"P(?:(?P<d>-?\d+)D)?(?:T(?:(?P<h>-?\d+)H)?(?:(?P<m>-?\d+)M)?(?:(?P<s>-?\d+(?:\.\d+)?)S)?)?",
        text,
    )
    if not m:
        raise ValueError(f"invalid ISO duration: {text!r}")
    return dt.timedelta(
        days=int(m["d"] or 0),
        hours=int(m["h"] or 0),
        minutes=int(m["m"] or 0),
        seconds=float(m["s"] or 0),
    )


def graphql_type(spark_type: T.DataType) -> GraphQLScalarType | None:
    """Spark dtype → GraphQL scalar (None = non-scalar: array/struct/map).

    Mirrors reference ``py_type`` (scalars.py:59-87)."""
    if isinstance(spark_type, T.BooleanType):
        return GraphQLBoolean
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType)):
        return GraphQLInt
    if isinstance(spark_type, T.LongType):
        return BigInt
    if isinstance(spark_type, (T.FloatType, T.DoubleType)):
        return GraphQLFloat
    if isinstance(spark_type, T.DecimalType):
        return Decimal
    if isinstance(spark_type, T.DateType):
        return Date
    if isinstance(spark_type, (T.TimestampType, T.TimestampNTZType)):
        return Datetime
    if isinstance(spark_type, T.TimeType):
        return Time
    if isinstance(spark_type, T.DayTimeIntervalType):
        return Duration
    if isinstance(spark_type, T.BinaryType):
        return Base64
    if isinstance(spark_type, T.StringType):
        return GraphQLString
    return None


__all__ = [
    "Base64",
    "BigInt",
    "Date",
    "Datetime",
    "Decimal",
    "Duration",
    "JSON",
    "Time",
    "graphql_type",
    "parse_duration",
]
