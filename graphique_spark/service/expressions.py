"""Recursive GraphQL ``Expression`` input → ``pyspark.sql.Column``.

Mirrors the reference's expression tree (reference inputs.py:249-557):
leaves are ``name`` (nested column path) or ``value`` (JSON literal);
interior nodes are comparison / boolean / arithmetic / conditional ops,
plus a generic ``call {func args}`` escape into the scalar function
library (graphique_spark.functions) so every §2.3 function is reachable
from GraphQL without one input field per function.

Exactly one leaf/op per node, as in the reference (inputs.py:311-315).
"""

from __future__ import annotations

import warnings
from typing import Any, Mapping

from graphql import (
    GraphQLBoolean,
    GraphQLInputField,
    GraphQLInputObjectType,
    GraphQLInt,
    GraphQLList,
    GraphQLNonNull,
    GraphQLString,
    Undefined,
)
from pyspark.sql import Column
from pyspark.sql import functions as F

from graphique_spark.functions import FUNCTIONS
from graphique_spark.service.scalars import (
    JSON,
    Base64,
    Date,
    Datetime,
    Duration,
    Time,
)

_BINARY = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}
_VARIADIC = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "xor": lambda a, b: a ^ b,
}


def _expr_fields():
    expr_list = GraphQLList(GraphQLNonNull(EXPRESSION))
    fields = {
        "name": GraphQLInputField(GraphQLString, description="column reference (dotted path)"),
        "value": GraphQLInputField(JSON, description="untyped literal"),
        # typed scalar leaves (reference `scalar` one-of, inputs.py:234-246)
        "date": GraphQLInputField(Date),
        "datetime": GraphQLInputField(Datetime),
        "duration": GraphQLInputField(Duration, description="ISO-8601, e.g. P1DT2H"),
        "base64": GraphQLInputField(
            Base64, description="binary literal, base64-encoded"
        ),
        "time": GraphQLInputField(Time, description="ISO-8601 time of day"),
        "inv": GraphQLInputField(EXPRESSION),
        "coalesce": GraphQLInputField(expr_list),
        "ifelse": GraphQLInputField(expr_list, description="[cond, then, else]"),
        "isin": GraphQLInputField(expr_list, description="[needle, ...haystack literals]"),
        "call": GraphQLInputField(
            GraphQLInputObjectType(
                "Call",
                {
                    "func": GraphQLInputField(GraphQLNonNull(GraphQLString)),
                    "args": GraphQLInputField(expr_list),
                    "options": GraphQLInputField(JSON),
                },
            ),
            description="scalar function library escape (graphique_spark.functions)",
        ),
        "window": GraphQLInputField(
            WINDOW, description="window functions (reference Window input, inputs.py:490-557)"
        ),
    }
    for op in _BINARY:
        fields[op] = GraphQLInputField(expr_list)
    for op in _VARIADIC:
        fields[op] = GraphQLInputField(expr_list)
    return fields


#: first-class window input (reference Window, inputs.py:490-557): rank
#: family, lag/lead, pairwise comparisons against the lagged value, and
#: windowed aggregates (cumulative by default when ordered and unframed).
_PAIRWISE = ("eq", "ne", "lt", "le", "gt", "ge", "sub")
_WIN_AGGS = ("count", "sum", "mean", "min", "max")
_WIN_RANKS = ("rowNumber", "rank", "denseRank", "percentRank", "cumeDist")


def _window_fields():
    str_list = GraphQLList(GraphQLNonNull(GraphQLString))
    fields = {
        "over": GraphQLInputField(str_list, description="partition column names"),
        "by": GraphQLInputField(str_list, description="order keys; '-' prefix = descending"),
        "preceding": GraphQLInputField(GraphQLInt),
        "following": GraphQLInputField(GraphQLInt),
        "range": GraphQLInputField(GraphQLBoolean),
        "offset": GraphQLInputField(GraphQLInt, description="offset for lag/lead/pairwise"),
        "default": GraphQLInputField(JSON, description="fill for lag/lead/pairwise"),
        "ntile": GraphQLInputField(GraphQLInt),
        "zeroBased": GraphQLInputField(GraphQLBoolean, description="0-based ranks"),
        "lag": GraphQLInputField(EXPRESSION),
        "lead": GraphQLInputField(EXPRESSION),
    }
    for op in _PAIRWISE:
        fields[op] = GraphQLInputField(EXPRESSION, description=f"pairwise {op} vs lagged value")
    for op in _WIN_AGGS:
        fields[op] = GraphQLInputField(EXPRESSION)
    for op in _WIN_RANKS:
        fields[op] = GraphQLInputField(GraphQLBoolean)
    return fields


WINDOW: GraphQLInputObjectType = GraphQLInputObjectType("WindowInput", _window_fields)

EXPRESSION: GraphQLInputObjectType = GraphQLInputObjectType("Expression", _expr_fields)


def compile_expression(node: Mapping[str, Any] | None) -> Column:
    if node is None:
        raise ValueError("empty expression")
    given = {k: v for k, v in node.items() if v is not Undefined}
    if len(given) != 1:
        raise ValueError(f"conflicting inputs: exactly one of {sorted(given)} allowed")
    [(op, arg)] = given.items()
    if op == "name":
        return F.col(arg)
    if op in ("value", "date", "datetime", "duration", "base64", "time"):
        return scalar_literal(arg)  # typed leaves arrive pre-parsed
    if op == "inv":
        return ~compile_expression(arg)
    if op == "coalesce":
        return F.coalesce(*[compile_expression(a) for a in arg])
    if op == "ifelse":
        cond, then, other = (compile_expression(a) for a in arg)
        return F.when(cond, then).otherwise(other)
    if op == "isin":
        needle, *hay = arg
        return compile_expression(needle).isin([a.get("value") for a in hay])
    if op == "call":
        return _compile_call(arg)
    if op == "window":
        return _compile_window(arg)
    args = [compile_expression(a) for a in arg]
    if op in _BINARY:
        if len(args) != 2:
            raise ValueError(f"{op} takes exactly 2 operands")
        return _BINARY[op](*args)
    fn = _VARIADIC[op]
    out = args[0]
    for nxt in args[1:]:
        out = fn(out, nxt)
    return out


#: window-spec keys recognized inside ``call.options`` (reference Window
#: input, inputs.py:490-557): partition ``over``, sort ``by`` ('-' prefix =
#: descending), optional rows/range frame.
_WINDOW_KEYS = ("over", "orderBy", "preceding", "following", "range", "zeroBased")


def _window_spec(opts: dict[str, Any]):
    from pyspark.sql import Window

    over = opts.get("over") or []
    order = [
        F.col(c.lstrip("-")).desc() if c.startswith("-") else F.col(c)
        for c in opts.get("orderBy") or []
    ]
    if order and not over:
        warnings.warn(
            "window ordered with empty 'over': the whole table flows through "
            "one task; partition with 'over' or use order/first at scale",
            stacklevel=2,
        )
    spec = Window.partitionBy(*[F.col(c) for c in over])
    if order:
        spec = spec.orderBy(*order)
    preceding, following = opts.get("preceding"), opts.get("following")
    if preceding is not None or following is not None:
        lo = -int(preceding) if preceding is not None else Window.unboundedPreceding
        hi = int(following) if following is not None else Window.unboundedFollowing
        spec = spec.rangeBetween(lo, hi) if opts.get("range") else spec.rowsBetween(lo, hi)
    return spec


def _compile_window(spec: Mapping[str, Any]) -> Column:
    """Compile the first-class WindowInput (reference inputs.py:540-557).

    Pairwise ``eq/ne/lt/le/gt/ge/sub`` compare each value against its lagged
    value over the window: ``op(expr, lag(expr, offset))``, null-filled with
    ``default``. Windowed aggregates default to a cumulative frame when
    ordered and unframed, matching the reference's cumulative_window.
    """
    given = {k: v for k, v in spec.items() if v is not Undefined and v is not None}
    opts = {
        "over": given.get("over") or [],
        "orderBy": given.get("by") or [],
        "preceding": given.get("preceding"),
        "following": given.get("following"),
        "range": given.get("range", False),
    }
    offset = int(given.get("offset", 1))
    default = given.get("default")
    zero = bool(given.get("zeroBased", False))
    framed = opts["preceding"] is not None or opts["following"] is not None
    win = _window_spec(opts)
    # cumulative default for aggregates: ordered + unframed (reference
    # cumulative_window, inputs.py:542-543)
    if opts["orderBy"] and not framed:
        from pyspark.sql import Window as W

        cumwin = _window_spec({"over": opts["over"], "orderBy": opts["orderBy"]}).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    else:
        cumwin = win

    ops = [
        k
        for k in given
        if k in _PAIRWISE + _WIN_AGGS + _WIN_RANKS + ("lag", "lead", "ntile")
    ]
    if len(ops) != 1:
        raise ValueError(f"exactly one window function required, got {sorted(ops)}")
    [op] = ops
    if op in _WIN_RANKS:
        fn = {
            "rowNumber": F.row_number,
            "rank": F.rank,
            "denseRank": F.dense_rank,
            "percentRank": F.percent_rank,
            "cumeDist": F.cume_dist,
        }[op]
        out = fn().over(win)
        return out - 1 if zero and op in ("rowNumber", "rank", "denseRank") else out
    if op == "ntile":
        return F.ntile(int(given["ntile"])).over(win)
    expr = compile_expression(given[op])
    if op in ("lag", "lead"):
        fn = F.lag if op == "lag" else F.lead
        return fn(expr, offset, default).over(win)
    if op in _PAIRWISE:
        lagged = F.lag(expr, offset).over(win)
        pair = {
            "eq": lambda a, b: a == b,
            "ne": lambda a, b: a != b,
            "lt": lambda a, b: a < b,
            "le": lambda a, b: a <= b,
            "gt": lambda a, b: a > b,
            "ge": lambda a, b: a >= b,
            "sub": lambda a, b: a - b,
        }[op](expr, lagged)
        return F.coalesce(pair, F.lit(default)) if default is not None else pair
    agg = {"count": F.count, "sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}[op]
    return agg(expr).over(cumwin)


def scalar_literal(value: Any) -> Column:
    """Typed scalar -> Column literal. Month-bearing ISO durations
    (``P1Y2M...``) can't be a timedelta literal — months have no fixed
    length — so they build a calendar interval, which Spark's
    date/timestamp arithmetic accepts."""
    from graphique_spark.service.scalars import MonthDayDuration

    if isinstance(value, MonthDayDuration):
        return F.make_interval(
            F.lit(0),
            F.lit(value.months),
            F.lit(0),
            F.lit(value.days),
            F.lit(0),
            F.lit(0),
            F.lit(value.seconds + value.microseconds / 1_000_000),
        )
    return F.lit(value)


#: functions the `call` escape hatch must NEVER reach: each evaluates raw
#: SQL text or invokes arbitrary JVM/Python code, so allowing them would
#: bypass the service's allow_sql=False gate (e.g. call(func: "expr")
#: compiles F.expr(<attacker SQL>) -> java_method/reflect execution)
_UNSAFE_CALLS = frozenset(
    {
        "expr", "call_function", "call_udf", "java_method", "reflect",
        "try_reflect", "udf", "udtf", "pandas_udf", "unwrap_udt",
    }
)


def _compile_call(spec: Mapping[str, Any]) -> Column:
    func = spec["func"]
    if func in _UNSAFE_CALLS:
        raise ValueError(
            f"function {func!r} is not callable through the expression "
            "tree: it evaluates raw SQL or arbitrary code (use the gated "
            "sql field instead)"
        )
    raw_args = spec.get("args") or []
    if raw_args is Undefined:
        raw_args = []
    args = [compile_expression(a) for a in raw_args]
    options = spec.get("options")
    if options is Undefined or options is None:
        options = {}
    options = dict(options)
    window = {k: options.pop(k) for k in _WINDOW_KEYS if k in options}
    if func in FUNCTIONS:
        out = FUNCTIONS[func](*args, **options)
    else:
        fn = getattr(F, func, None)
        if fn is None or func.startswith("_"):
            raise ValueError(f"unknown function: {func!r}")
        out = fn(*args, **options)
    if window:
        zero = window.pop("zeroBased", False)
        out = out.over(_window_spec(window))
        if zero:  # reference ranks are 0-based (test_service.py:248-253)
            out = out - 1
    return out
