"""Plan lint: every suite query's physical plan is screened for the two
join shapes that destroy 100 TB runs — CartesianProduct and
BroadcastNestedLoopJoin — plus Python row-at-a-time evaluation
(BatchEvalPython). A new query that accidentally introduces one fails CI
here, not on the cluster.

Whitelist rationale:
* knn_join — deliberate bounded cross join (small broadcast query side);
  its scale path is knn_join_lsh.
* scalar one-row cross joins (corpus stats, normalizers) compile to
  BroadcastNestedLoopJoin with a 1-row build side — constant work. They
  are recognized by the build side being a one-row aggregate, but Spark's
  plan string doesn't expose cardinality, so queries known to use ONLY
  the one-row pattern are listed explicitly.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: queries whose NLJ/cross is a deliberate bounded pattern (see module doc)
NLJ_WHITELIST = {
    "knn_join",           # bounded broadcast cross join by design
    "cross_join_dims",    # the crossJoin operator's own oracle query
    "similarity_topk",    # 1-row query-vector literal join
    "ab_test_welch",      # 1-row x 1-row arm join
    "temperature_sampling_shares",  # 1-row normalizer joins
    "dedup_savings_report",         # 1-row totals join
    "corpus_overlap_minhash",       # 1-row x 1-row signature join
    "balanced_shard_manifest",      # 1-row total join
    "histogram_equidepth",          # 1-row boundary-array join
    "quantile_multi",               # 1-row percentile-array join
    "sample_hash",                  # scalar threshold join
    "mixture_sample",               # 1-row rate-table join
    "q22_global_sales_opportunity", # 1-row average join
    "q14_promo_revenue",            # single-aggregate ratio
    "winsorize_clip",               # per-group bounds broadcast (tiny)
    "join_semi_anti",               # fused 1-row semi-count x anti-count
    "fill_drop_null",               # 1-row summary-count join
    "decontaminate_bloom",          # fixed-size bloom array rides a 1-row cross
    "data_quality_report",          # 1-row totals join (FK rule)
    "quantile_normalize_scores",    # 1-row global-percentile-array join
    "q15_top_supplier",             # 1-row scalar-max join
    "resample_interpolate",         # per-user bounds ride 1-row-per-key sequences
    "pack_efficiency",              # 1-row packing-rollup scalars
    "source_overlap_matrix",        # #groups-row signature self-join (non-equi
                                    # by design: every pair of ~20 sources)
    "hourly_seasonality",           # 1-row total join
    "similarity_ivf_trained",       # ground-truth side reuses knn_join's
                                    # bounded 8-row broadcast cross; the
                                    # IVF side under audit is an equi-join
}

#: e2e queries that RUN streaming jobs / write files when invoked — their
#: plan is the final read-back, not the interesting part; linting them
#: would execute multi-batch pipelines for nothing
SKIP = {
    "stream_upsert_totals",
    "stream_cdc_snapshot",
    "partition_roundtrip",
    "compact_roundtrip",
    "dedup_incremental",
    "similarity_ann_lsh",  # builds + probes a written index
    "source_catalog",
}


@pytest.fixture(scope="module")
def plans(spark):
    from graphique_spark.plans import plan_string
    from graphique_spark.suite import QUERIES
    import graphique_spark.suite_llm  # noqa: F401
    import graphique_spark.suite_streaming  # noqa: F401

    out = {}
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        out[name] = plan_string(fn(spark, SF_DIR))
        spark.catalog.clearCache()
    return out


def test_no_cartesian_products(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if "CartesianProduct" in plan and name not in NLJ_WHITELIST
    ]
    assert not offenders, f"cartesian product in: {offenders}"


def test_no_unexpected_nested_loop_joins(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if "BroadcastNestedLoopJoin" in plan and name not in NLJ_WHITELIST
    ]
    assert not offenders, f"nested-loop join in: {offenders}"


def test_no_python_row_udfs(plans):
    # ArrowEvalPython (pandas_udf / mapInPandas) is fine; BatchEvalPython
    # is the row-at-a-time path that must never appear
    offenders = [name for name, plan in plans.items() if "BatchEvalPython" in plan]
    assert not offenders, f"row-at-a-time Python eval in: {offenders}"


def test_plans_api_reports_and_asserts(spark, tables):
    # the lint's engine as a public API: analyze() summarizes, and
    # assert_scalable() raises exactly on the scale-killer shapes
    from pyspark.sql import functions as F

    from graphique_spark import plans

    nation = tables["nation"].df
    orders = tables["orders"].df
    # an inequality-only join condition degrades to a nested loop -> flagged
    bad = orders.join(F.broadcast(nation), orders["o_custkey"] > nation["n_nationkey"])
    import pytest as _pytest

    with _pytest.raises(plans.PlanWarningError, match="NestedLoop|Cartesian"):
        plans.assert_scalable(bad)
    report = plans.assert_scalable(bad, allow_nested_loop=True)
    assert report.broadcast_nested_loop_joins >= 1

    agg = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    report = plans.assert_scalable(agg)
    assert report.exchanges >= 1 and report.scans == 1
    assert not report.scale_killers
    with _pytest.raises(plans.PlanWarningError, match="exchanges"):
        plans.assert_scalable(agg, max_exchanges=0)

    # pushdown is visible in the report
    filt = orders.where(F.col("o_orderkey") == 7).select("o_orderkey")
    rep = plans.analyze(filt)
    assert any("o_orderkey" in p for p in rep.pushed_filters)


def test_plans_counts_roundrobin_exchanges(spark, tables):
    # repartition(n) emits Exchange RoundRobinPartitioning — a real
    # shuffle that the exchange count (and max_exchanges gates built on
    # it) must see
    from graphique_spark import plans

    rr = tables["orders"].df.repartition(8)
    assert plans.analyze(rr).exchanges == 1
