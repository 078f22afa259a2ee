"""Array functions (reference ``Arrays``, inputs.py:329-374).

Aggregating forms without Spark builtins (``means``, ``modes``) are
higher-order-function compositions (``aggregate``/``filter``/``transform``)
— still JVM expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "alls", "anys", "arr_concat", "arr_contains", "arr_index", "arr_join",
    "arr_length", "arr_remove", "arr_repeat", "arr_slice", "arr_sort",
    "arr_unique", "flatten", "intersect", "maxs", "means", "mins", "modes",
    "sums", "union", "value_at", "zip_arrays",
]

flatten = F.flatten
arr_sort = F.array_sort
arr_unique = F.array_distinct
arr_concat = F.concat
arr_remove = F.array_remove
arr_repeat = F.array_repeat
intersect = F.array_intersect
union = F.array_union
zip_arrays = F.arrays_zip


def alls(col: Column) -> Column:
    """True if every element is true (null-tolerant like Arrow ``all``)."""
    return F.forall(col, lambda x: x)


def anys(col: Column) -> Column:
    return F.exists(col, lambda x: x)


def arr_length(col: Column) -> Column:
    return F.array_size(col)


def maxs(col: Column) -> Column:
    return F.array_max(col)


def mins(col: Column) -> Column:
    return F.array_min(col)


def _nn_total(col: Column) -> Column:
    # fold over the NON-NULL elements only: acc + NULL nulls the whole
    # fold, which would contradict means' non-null denominator (and the
    # Arrow/SQL convention that aggregates skip nulls)
    return F.aggregate(
        F.filter(col, lambda x: x.isNotNull()), F.lit(0.0), lambda acc, x: acc + x
    )


def sums(col: Column) -> Column:
    # NULL (not 0) when no non-null elements, matching SQL list-sum
    n = F.size(F.filter(col, lambda x: x.isNotNull()))
    return F.when(n > 0, _nn_total(col))


def means(col: Column) -> Column:
    n = F.size(F.filter(col, lambda x: x.isNotNull()))
    return F.when(n > 0, _nn_total(col) / n)


def modes(col: Column) -> Column:
    """Most frequent element: count each distinct element via higher-order
    functions and take the max by (count, element)."""
    distinct = F.array_distinct(col)
    counted = F.transform(
        distinct,
        lambda v: F.struct(
            F.size(F.filter(col, lambda x: x == v)).alias("n"), v.alias("v")
        ),
    )
    return F.array_max(counted)["v"]


def arr_contains(col: Column, value) -> Column:
    return F.array_contains(col, value)


def arr_index(col: Column, value) -> Column:
    """0-based index of first occurrence, -1 if absent (Arrow ``index``)."""
    return F.array_position(col, value).cast("int") - 1


def value_at(col: Column, offset: int) -> Column:
    """Element at 0-based offset; negative offsets count from the end.
    Out of bounds is NULL in both directions (reference test_models.py
    value/index pins) — plain ``element_at`` RAISES under ANSI mode for a
    negative index past the start, so the try_ form is load-bearing."""
    return F.get(col, offset) if offset >= 0 else F.try_element_at(col, F.lit(offset))


def arr_slice(col: Column, offset: int = 0, limit: int | None = None) -> Column:
    """0-based slice with optional length; negative offset from the end
    (reference test_models.py:149-151)."""
    if offset >= 0:
        start: Column | int = offset + 1
        length = F.lit(limit) if limit is not None else F.greatest(
            F.size(col) - offset, F.lit(0)
        )
    else:
        # clamp a negative offset past the start to the array head (Python
        # slice semantics: [1,2,3][-5:] == [1,2,3]) — a raw negative start
        # handed to F.slice returns [] once |offset| exceeds the length
        start = F.greatest(F.size(col) + offset, F.lit(0)) + 1
        length = F.lit(limit) if limit is not None else F.lit(-offset)
    return F.slice(col, start, length)


def arr_join(col: Column, sep: str) -> Column:
    return F.array_join(col, sep)
