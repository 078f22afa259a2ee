"""Composite operators Spark lacks natively.

Each is expressed as a composition of DataFrame operators (shuffles, windows,
broadcast joins) — never a driver-side loop over rows — so they scale with
the cluster.
"""

from graphique_spark.operators.asof import asof_join
from graphique_spark.operators.sequence import with_row_index, with_run_ids
from graphique_spark.operators.topk import rank_filter, top_k

__all__ = ["asof_join", "rank_filter", "top_k", "with_row_index", "with_run_ids"]
