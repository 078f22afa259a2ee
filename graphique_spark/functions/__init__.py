"""Scalar function library: the reference's ``Expression`` function surface
(reference inputs.py:249-557) as plain ``Column -> Column`` helpers.

All JVM-side built-ins — no Python UDFs — so expressions stay inside
whole-stage codegen. Functions whose Spark builtin differs semantically from
the reference (``capitalize``, literal ``split``, 0-based ranks, array
``means``/``modes``) are reimplemented here with matching semantics.
"""

from graphique_spark.functions import arrays, numeric, strings, temporal
from graphique_spark.functions.arrays import *  # noqa: F401,F403
from graphique_spark.functions.numeric import *  # noqa: F401,F403
from graphique_spark.functions.strings import *  # noqa: F401,F403
from graphique_spark.functions.temporal import *  # noqa: F401,F403

__all__ = (
    list(strings.__all__) + list(numeric.__all__) + list(temporal.__all__) + list(arrays.__all__)
)

#: name → callable registry, the dispatch table for GraphQL ``call`` expressions
FUNCTIONS = {name: globals()[name] for name in __all__}
