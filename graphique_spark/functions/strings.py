"""String functions (reference ``Strings``, inputs.py:423-447).

Semantics notes vs Spark builtins:

* ``capitalize`` = first char upper, *rest lower* — over the whole string,
  not per word (reference test: "NY" -> "Ny", test_service.py:85-87), so
  ``initcap`` is wrong; composed from substr/upper/lower instead.
* ``split`` takes a *literal* separator (Arrow semantics); Spark's ``split``
  is always a regex, so the separator is regex-escaped. ``re_split`` exposes
  the regex form.
* ``find`` returns a 0-based index or -1 (Python ``str.find``), vs Spark's
  1-based ``locate`` returning 0 when absent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "capitalize", "contains", "endswith", "find", "length", "lower", "lpad",
    "lstrip", "re_extract", "re_search", "re_split", "replace", "reverse",
    "rpad", "rstrip", "split", "startswith", "strip", "upper",
]

_REGEX_SPECIALS = r"\.^$*+?()[]{}|"


def _escape_regex(sep: str) -> str:
    return "".join("\\" + ch if ch in _REGEX_SPECIALS else ch for ch in sep)


def capitalize(col: Column) -> Column:
    return F.concat(
        F.upper(col.substr(F.lit(1), F.lit(1))), F.lower(col.substr(F.lit(2), F.length(col)))
    )


def contains(col: Column, needle: str) -> Column:
    return col.contains(needle)


def endswith(col: Column, suffix: str) -> Column:
    return col.endswith(suffix)


def startswith(col: Column, prefix: str) -> Column:
    return col.startswith(prefix)


def find(col: Column, needle: str) -> Column:
    """0-based index of first occurrence, -1 if absent."""
    return F.locate(needle, col) - 1


def length(col: Column) -> Column:
    return F.length(col)


def lower(col: Column) -> Column:
    return F.lower(col)


def upper(col: Column) -> Column:
    return F.upper(col)


def lpad(col: Column, width: int, fill: str = " ") -> Column:
    return F.lpad(col, width, fill)


def rpad(col: Column, width: int, fill: str = " ") -> Column:
    return F.rpad(col, width, fill)


def lstrip(col: Column, chars: str | None = None) -> Column:
    return F.ltrim(col) if chars is None else F.ltrim(col, F.lit(chars))


def rstrip(col: Column, chars: str | None = None) -> Column:
    return F.rtrim(col) if chars is None else F.rtrim(col, F.lit(chars))


def strip(col: Column, chars: str | None = None) -> Column:
    return F.trim(col) if chars is None else F.trim(col, F.lit(chars))


def re_extract(col: Column, pattern: str, group: int = 0) -> Column:
    return F.regexp_extract(col, pattern, group)


def re_search(col: Column, pattern: str) -> Column:
    """True if the regex matches anywhere (unanchored), like ``re.search``."""
    return col.rlike(pattern)


def re_split(col: Column, pattern: str) -> Column:
    return F.split(col, pattern)


def split(col: Column, sep: str) -> Column:
    """Literal-separator split (reference/Arrow semantics)."""
    return F.split(col, _escape_regex(sep))


def replace(col: Column, search: str, repl: str) -> Column:
    """Literal replacement (Spark ``replace``, not regex)."""
    return F.replace(col, F.lit(search), F.lit(repl))


def reverse(col: Column) -> Column:
    return F.reverse(col)
