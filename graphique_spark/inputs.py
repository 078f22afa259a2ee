"""Typed query inputs compiled to ``pyspark.sql.Column`` expressions.

Mirrors the reference's input model (reference inputs.py:66-231): per-column
``Filter`` predicates and a 19-kind ``Agg`` aggregate descriptor with
per-aggregate ``where`` filtering. Everything compiles to built-in Spark SQL
functions — no Python UDFs — so the hot path stays inside whole-stage
codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_MISSING = object()


@dataclass
class Filter:
    """Simple per-column predicates, AND-ed together.

    Semantics follow reference inputs.py:68-122 / test_service.py:156-159:

    * ``eq`` / ``ne`` take *lists*: one element compiles to ``==`` / ``!=``,
      several to ``isin`` / ``~isin``, an empty ``eq`` list matches nothing,
      and ``eq=None`` compiles to ``col == NULL`` which matches nothing
      (SQL null comparison).
    * ``lt le gt ge`` are scalars.
    * On array columns ``contains`` maps to ``array_contains``.
    """

    eq: Sequence[Any] | None | object = _MISSING
    ne: Sequence[Any] | None | object = _MISSING
    lt: Any = _MISSING
    le: Any = _MISSING
    gt: Any = _MISSING
    ge: Any = _MISSING
    contains: Any = _MISSING

    def to_column(self, col: Column) -> Column:
        exprs: list[Column] = []
        if self.eq is not _MISSING:
            if self.eq is None:
                exprs.append(col == F.lit(None))  # never true, by design
            elif len(self.eq) == 0:
                exprs.append(F.lit(False))
            elif len(self.eq) == 1:
                exprs.append(col == F.lit(self.eq[0]))
            else:
                exprs.append(col.isin(list(self.eq)))
        if self.ne is not _MISSING:
            if self.ne is None:
                exprs.append(col != F.lit(None))  # never true
            elif len(self.ne) == 1:
                exprs.append(col != F.lit(self.ne[0]))
            elif self.ne:
                exprs.append(~col.isin(list(self.ne)))
        for op, attr in [("__lt__", "lt"), ("__le__", "le"), ("__gt__", "gt"), ("__ge__", "ge")]:
            value = getattr(self, attr)
            if value is not _MISSING:
                exprs.append(getattr(col, op)(F.lit(value)))
        if self.contains is not _MISSING:
            exprs.append(F.array_contains(col, F.lit(self.contains)))
        if not exprs:
            return F.lit(True)
        out = exprs[0]
        for expr in exprs[1:]:
            out = out & expr
        return out


@dataclass
class Agg:
    """One aggregate: function ``kind`` over column ``name``.

    Covers the reference's full aggregate set (reference inputs.py:206-231):
    all any argmax argmin collect concat count first last kurtosis max mean
    min mode nunique quantile std sum var — each with an optional per-agg
    ``where`` filter (compiled as ``f(CASE WHEN where THEN col END)``, the
    Spark equivalent of SQL ``FILTER (WHERE ...)``).
    """

    kind: str
    name: str = ""
    alias: str = ""
    where: Column | None = None
    # variant options
    distinct: bool = False
    order_by: str | Sequence[str] | None = None
    include_null: bool = False
    sep: str = ","
    q: float | Sequence[float] = 0.5
    approx: bool = False
    how: str = "sample"  # sample | pop, for std/var/kurtosis
    key: str = ""  # argmax/argmin ranking key

    @property
    def out_name(self) -> str:
        return self.alias or self.name or self.kind

    def _filtered_key(self) -> Column:
        """argmax/argmin ranking key with the per-agg ``where`` applied:
        max_by/min_by skip NULL ordering keys, so nulling the key excludes
        the row ENTIRELY — filtering only the value would let an excluded
        row still win the ranking and return NULL."""
        key = F.col(self.key)
        return F.when(self.where, key) if self.where is not None else key

    def _input(self) -> Column:
        col = F.col(self.name) if self.name else F.lit(1)
        if self.where is not None:
            col = F.when(self.where, col)  # NULL otherwise -> ignored by aggs
        return col

    def _ordered_collect(self, desc: bool, keep_null_values: bool = False) -> Column:
        """Order-aware collect: sort an array of (key, value) structs.

        ``array_sort`` of structs compares fields in order, so packing the
        sort keys first gives an ordered ``collect_list`` without a shuffle
        beyond the aggregation itself. Descending keys are type-agnostic:
        all-ascending / all-descending use the natural struct ordering
        (reversed for descending); mixed directions use an ``array_sort``
        comparator lambda — never arithmetic negation, which only works for
        numerics.

        The per-agg ``where`` filter applies to the WHOLE packed struct (a
        null struct is dropped by ``collect_list``), so an excluded row
        vanishes entirely — a when() on just the value would leave a
        (key, NULL) element that pollutes the order and the result.
        Genuinely-null values are then dropped too unless
        ``keep_null_values`` (first/last honor ``include_null`` with it),
        matching the unordered paths' collect_list/ignorenulls semantics.
        """
        keys = [self.order_by] if isinstance(self.order_by, str) else list(self.order_by or [])
        dirs = [key.startswith("-") for key in keys]
        cols = [F.col(key.lstrip("-")) for key in keys]
        raw = F.col(self.name) if self.name else F.lit(1)
        # named_struct, not struct(alias(...)): identical semantics, but
        # CreateNamedStruct built from aliases prints `struct(a, b)` in its
        # .sql() rendering — dropping the field names `to_sql` needs
        packed_args: list[Column] = []
        for i, k in enumerate(cols):
            packed_args += [F.lit(f"_k{i}"), k]
        packed = F.named_struct(*packed_args, F.lit("_v"), raw)
        if self.where is not None:
            packed = F.when(self.where, packed)
        collected = F.collect_list(packed)
        if not any(dirs):
            arr = F.array_sort(collected)
        elif all(dirs):
            # reverse of ascending == descending with nulls last (Spark's
            # desc default)
            arr = F.reverse(F.array_sort(collected))
        else:
            arr = F.array_sort(collected, _struct_comparator(dirs))
        if not keep_null_values:
            arr = F.filter(arr, lambda s: s["_v"].isNotNull())
        if desc:
            arr = F.reverse(arr)
        return F.transform(arr, lambda s: s["_v"])

    def to_column(self) -> Column:  # noqa: C901 - one dispatch table
        kind, col = self.kind, self._input()
        if kind == "all":
            out = F.bool_and(col)
        elif kind == "any":
            out = F.bool_or(col)
        elif kind == "argmax":
            out = F.max_by(col, self._filtered_key())
        elif kind == "argmin":
            out = F.min_by(col, self._filtered_key())
        elif kind == "collect":
            if self.order_by:
                out = self._ordered_collect(desc=False)
            elif self.distinct:
                out = F.collect_set(col)
            else:
                out = F.collect_list(col)
        elif kind == "concat":
            arr = self._ordered_collect(desc=False) if self.order_by else F.collect_list(col)
            out = F.array_join(arr, self.sep)
        elif kind == "count":
            out = F.count_distinct(col) if self.distinct else F.count(col)
        elif kind == "first":
            if self.order_by:
                # F.get, not [0]: an all-filtered group has an empty array
                # and ANSI mode makes [0] raise instead of returning NULL
                out = F.get(
                    self._ordered_collect(
                        desc=False, keep_null_values=self.include_null
                    ),
                    0,
                )
            else:
                out = F.first(col, ignorenulls=not self.include_null)
        elif kind == "last":
            if self.order_by:
                out = F.get(
                    self._ordered_collect(
                        desc=True, keep_null_values=self.include_null
                    ),
                    0,
                )
            else:
                out = F.last(col, ignorenulls=not self.include_null)
        elif kind == "kurtosis":
            out = self._kurtosis(col)
        elif kind == "max":
            out = F.max(col)
        elif kind == "mean":
            out = F.avg(col)
        elif kind == "min":
            out = F.min(col)
        elif kind == "mode":
            out = F.mode(col)
        elif kind == "nunique":
            out = F.approx_count_distinct(col) if self.approx else F.count_distinct(col)
        elif kind == "quantile":
            qs = F.lit(self.q) if isinstance(self.q, (int, float)) else F.array(*map(F.lit, self.q))
            out = F.percentile_approx(col, qs) if self.approx else F.percentile(col, qs)
        elif kind == "std":
            out = F.stddev_samp(col) if self.how == "sample" else F.stddev_pop(col)
        elif kind == "sum":
            out = F.sum(col)
        elif kind == "var":
            out = F.var_samp(col) if self.how == "sample" else F.var_pop(col)
        else:
            raise ValueError(f"unknown aggregate kind: {kind!r}")
        return out.alias(self.out_name)

    def _kurtosis(self, col: Column) -> Column:
        """Excess kurtosis; Spark's builtin is the population statistic g2.

        The sample statistic (how='sample', matching DuckDB/pandas) is
        ``G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)*(n-3))``.
        """
        g2 = F.kurtosis(col)
        if self.how == "pop":
            return g2
        n = F.count(col).cast("double")
        return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))


def _struct_comparator(dirs: Sequence[bool]):
    """Comparator lambda over ``_k0.._kN`` struct fields with per-key
    direction (True = descending). Nulls sort first ascending / last
    descending, matching Spark's asc/desc defaults."""

    def compare(left: Column, right: Column) -> Column:
        result = F.lit(0)
        for i, descending in reversed(list(enumerate(dirs))):
            lk, rk = left[f"_k{i}"], right[f"_k{i}"]
            lt_res, gt_res = (F.lit(1), F.lit(-1)) if descending else (F.lit(-1), F.lit(1))
            result = (
                F.when(lk.isNull() & rk.isNull(), result)
                .when(lk.isNull(), lt_res)
                .when(rk.isNull(), gt_res)
                .when(lk < rk, lt_res)
                .when(lk > rk, gt_res)
                .otherwise(result)
            )
        return result

    return compare


def combine_filters(filters: dict[str, Filter], where: Column | None = None) -> Column:
    """AND together per-column filters plus an optional expression filter.

    No leading ``lit(True)`` seed: Catalyst folds it away anyway, but it
    would leak into ``to_sql`` renderings as ``WHERE (true AND ...)``."""
    out: Column | None = None
    for name, flt in filters.items():
        piece = flt.to_column(F.col(name))
        out = piece if out is None else out & piece
    if where is not None:
        out = where if out is None else out & where
    return out if out is not None else F.lit(True)
