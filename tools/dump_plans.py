"""Dump formatted physical plans for headline queries into PLANS.md —
greppable evidence of the plan shapes the engine is designed around:
pushed filters, pruned ReadSchema, broadcast joins, TakeOrderedAndProject
top-k, metadata-only LocalRelation fast paths, map-only stages.

Usage: PYTHONPATH=/root/repo python tools/dump_plans.py
"""

from __future__ import annotations

import re

SF_DIR = "/root/testdata/sf0.01"

#: query -> the plan property a reviewer should find in it
HIGHLIGHTS = {
    "html_extract_text": "whole extractor is one map-only Project (fixed regexp chain in a single codegen stage), then partial agg before the lone exchange",
    "url_domain_blocklist": "blocklist is a literal array: map-only arrays_overlap filter inside codegen, single rollup exchange, zero joins",
    "url_normalize_dedup": "one HashAggregate exchange on the normalized URL + broadcast semi-join on survivor ids; normalization is all map-side HOFs",
    "dsir_importance": "broadcast log-ratio join (fixed bucket table); one explode + one per-doc HashAggregate; TakeOrderedAndProject for the top-25",
    "split_leakage_safe": "band-key-only shuffles into the CC pipeline; split assignment is a map-side md5 expression over the canonical id",
    "filter_predicates": "PushedFilters on the lineitem scan; ReadSchema pruned to used columns",
    "q1_pricing_summary": "partial (map-side) HashAggregate before the exchange",
    "join_star_broadcast": "BroadcastHashJoin on every dimension table",
    "top_k_global": "TakeOrderedAndProject — per-partition heaps, no global sort",
    "partition_metadata_groups": "LocalRelation / no parquet scan: answered from footers",
    "order_partition_prune": "scan lists only the files covering the limit (footer pruning)",
    "pii_redact": "single map-only Project inside whole-stage codegen, zero Exchange",
    "sample_weighted": "TakeOrderedAndProject over map-side A-Res keys",
    "dedup_minhash": "no per-shingle exchange: first shuffle is (doc, band) rows",
    "range_join_bands": "bucket equi-join (no BroadcastNestedLoopJoin for BETWEEN)",
    "dedup_incremental": (
        "index side never shuffles: new-batch band keys and candidate sets "
        "BroadcastExchange; index scans are map-side joins"
    ),
    "q5_region_volume": (
        "six-table join: every dimension (supplier/nation/region) "
        "BroadcastHashJoin, pushed date/region filters, partial agg"
    ),
    "q3_shipping_priority": (
        "TakeOrderedAndProject top-10 over the joined agg; shipdate/"
        "segment filters pushed into both scans"
    ),
    "cdc_apply": (
        "latest-op-per-key is a partial_max(struct) aggregate (map-side "
        "combined), never a Window; one anti-join against base"
    ),
    "snapshot_diff": (
        "full-outer exchange carries (key, 8-byte fingerprint) rows only — "
        "document bodies pruned before the aggregate"
    ),
    "histogram_equidepth": (
        "boundaries from one percentile aggregate row; bucket assignment "
        "in-row over the broadcast array; no global sort"
    ),
    "retrieval_bm25": (
        "query-term filter BEFORE the (doc, term) count shuffle; docfreq "
        "and corpus stats broadcast; TakeOrderedAndProject top-k"
    ),
    "image_dhash_dedup": (
        "only 8-byte hashes shuffle: distinct-hash band join, id "
        "expansion after the Hamming verify"
    ),
    "q18_large_orders": (
        "HAVING subquery aggregates lineitem first; qualifying keys "
        "broadcast back as a semi-join (AQE)"
    ),
    "dedup_segments_apply": (
        "keep decision is one combined count+min(struct) aggregate; "
        "rebuild is per-doc sort_array, bounded by the longest doc"
    ),
    "gap_fill_locf": (
        "forward and backward fills share one hash partitioning + sort "
        "(single Exchange, two frames)"
    ),
    "data_quality_report": (
        "all row-local rules fold into ONE conditional-count scan; "
        "unique = key-only groupBy; FK = one anti-join"
    ),
    "basket_cooccurrence": (
        "self-join WITHIN the order key — pair volume bounded by "
        "lines-per-order squared, never catalog squared"
    ),
    "corpus_term_drift": (
        "cohort membership as flags: one scan, one vocabulary shuffle "
        "with two conditional counts, heap top-k"
    ),
    "q21_suppliers_kept_waiting": (
        "EXISTS / NOT EXISTS self-joins rewritten into one per-order "
        "distinct-supplier aggregate; supplier and nation broadcast; "
        "top-100 is TakeOrderedAndProject"
    ),
    "lm_bigram_perplexity": (
        "bigrams via map-side slice+arrays_zip (no positional self-join); "
        "three map-side-combinable count aggregates; slim equi-joins"
    ),
    "json_variant_shred": (
        "JSON -> VARIANT -> typed path shredding is one map-side codegen "
        "projection (no Python, no shuffle) feeding a partial agg"
    ),
    "retrieval_hybrid_rrf": (
        "both retrieval legs bounded to <=50 rows before the fuse join; "
        "the only at-scale cost is the audited BM25/top-k plans"
    ),
    "stream_join_windowed": (
        "interval join stays a single hash join on user_id (range bound "
        "as a join condition, no nested loop); window count rides the "
        "same keyed exchange with partial aggregation"
    ),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from graphique_spark.session import DEFAULT_CONF

    builder = (
        SparkSession.builder.appName("plan-dump").master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in DEFAULT_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    sections = [
        "# Physical plans of headline queries (auto-generated)\n",
        "Regenerate: `PYTHONPATH=/root/repo python tools/dump_plans.py`.",
        f"Captured at sf0.01 with the engine's default session conf.\n",
    ]
    for name, highlight in HIGHLIGHTS.items():
        if name not in queries:
            print(f"WARNING: highlight {name!r} is not a registered query; skipped")
            continue
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # control chars (e.g. a \x00 literal in a plan) would make the
        # file read as binary to grep
        plan = re.sub(
            r"[\x00-\x08\x0b-\x1f]", lambda m: f"\\x{ord(m.group()):02x}", plan
        )
        sections.append(f"## {name}\n\n**Look for:** {highlight}\n\n```\n{plan}```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(sections))
    print(f"PLANS.md written ({len(HIGHLIGHTS)} plans)")


if __name__ == "__main__":
    main()
