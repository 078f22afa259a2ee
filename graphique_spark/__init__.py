"""graphique_spark: a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
coady/graphique (GraphQL service over columnar tables), re-expressed
Spark-first: every operator builds an *unexecuted* ``pyspark.sql.DataFrame``
(a Catalyst logical plan) and materializes only at scalar leaves, so
predicate pushdown, column pruning, partition pruning, join planning and
whole-stage codegen are delegated to Catalyst/Tungsten — the same way the
reference delegates to DuckDB (reference README.md:106-107).

Layout:
    session      SparkSession bootstrap tuned for large-scale workloads
    dataset      the ``Dataset`` wrapper: the full relational operator surface
    inputs       typed query inputs (Filter, Agg, ...) -> Column expressions
    functions/   scalar function library (strings, numeric, temporal, arrays)
    operators/   composite operators Spark lacks natively (as-of join, runs,
                 take-by-index, top-k rank filter)
    sources/     readers (parquet/hive roots, named multi-table roots) + sinks
    llm/         large-scale training-data pipeline ops (dedup, similarity,
                 text analysis, multimodal columns)
    streaming/   Structured Streaming surface (watermarks, windows, state)
    service/     GraphQL frontend on graphql-core (schema derived from the
                 table schema; resolvers build lazy DataFrames)
"""

from graphique_spark.dataset import Dataset
from graphique_spark.inputs import Agg, Filter
from graphique_spark.session import get_session

__all__ = ["Agg", "Dataset", "Filter", "get_session"]
__version__ = "0.1.0"
