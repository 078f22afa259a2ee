"""Drive graphique_spark through its public API over real parquet data.

The library's surface is the package boundary: a user imports
``graphique_spark``, roots Datasets at parquet files, chains operators, and
materializes at scalar leaves. This script is that user.
"""

import traceback

from graphique_spark import Agg, Filter, get_session
from graphique_spark.sources import load_tables

spark = get_session(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
tables = load_tables(
    spark, "/root/testdata/sf0.001",
    ["lineitem", "orders", "customer", "nation", "region", "events", "documents"],
)
li, orders, nation = tables["lineitem"], tables["orders"], tables["nation"]

checks = []


def _raises(fn):
    try:
        fn()
        return False
    except Exception:  # noqa: BLE001
        return True


def check(name, fn):
    try:
        result = fn()
        checks.append((name, "OK", result))
        print(f"  OK {name}: {result}")
    except Exception as exc:  # noqa: BLE001
        checks.append((name, "FAIL", exc))
        print(f"FAIL {name}: {exc}")
        traceback.print_exc()


# happy paths
check("count", lambda: li.count())
check("filter+group+order", lambda: li.filter(l_shipdate={"le": "1998-09-01"}).group(
    by=["l_returnflag"], aggregate=[Agg("sum", "l_quantity", alias="s")]
).order(by=["l_returnflag"]).values("s"))
check("join nation->region", lambda: nation.join("region", keys=["n_regionkey"],
    rkeys=["r_regionkey"], broadcast=True).count())
check("asof_join", lambda: tables["events"].asof_join(
    "events", on="ts", by=["user_id"], suffix="_prev").count())
check("runs", lambda: li.order(by=["l_orderkey"]).runs(
    by=["l_returnflag"], order_by=["l_orderkey", "l_linenumber"], counts="n").count())
check("distinct keep=first", lambda: li.distinct(on=["l_orderkey"]).count())
check("distinct keep=None", lambda: li.distinct(on=["l_orderkey"], keep=None).count())
check("take", lambda: nation.take([0, 5, 24]).values("n_name"))
check("slice negative offset", lambda: nation.order(by=["n_nationkey"]).slice(-3).count())
check("union+distinct", lambda: nation.union("nation", distinct=True).count())
check("difference", lambda: nation.difference(nation.filter(n_regionkey={"eq": [0]})).count())
check("row", lambda: nation.order(by=["n_nationkey"]).row(0)["n_name"])
check("any(limit)", lambda: li.filter(l_quantity={"gt": 49}).any())
check("unpack/unnest roundtrip", lambda: nation.project(
    {"arr": __import__("pyspark.sql.functions", fromlist=["F"]).array("n_nationkey")}
).unnest("arr", offset="i").count())
check("group by=[] one row", lambda: li.group(aggregate=[Agg("count", alias="n")]).values("n"))

# probes: edge semantics
check("probe eq:[] matches nothing", lambda: li.filter(l_returnflag={"eq": []}).count())
check("probe eq:None matches nothing", lambda: li.filter(l_returnflag=Filter(eq=None)).count())
check("probe eq list isin", lambda: li.filter(l_returnflag={"eq": ["A", "N"]}).count())
check("probe unknown agg kind raises", lambda: (
    "raised" if _raises(lambda: Agg("bogus", "l_quantity").to_column()) else "NO ERROR"))
check("probe take out-of-range index", lambda: nation.take([0, 999]).count())
check("probe slice offset beyond end", lambda: nation.slice(100, 5).count())
check("probe row index out of range", lambda: (
    "raised" if _raises(lambda: nation.slice(0, 1).row(5)) else "NO ERROR"))

# probes: round-1 additions (rollup/cube, explain, take_from)
check("rollup adds subtotal rows", lambda: nation.rollup(by=["n_regionkey"], counts="n").count())
check("cube grand total", lambda: nation.cube(by=["n_regionkey"], counts="n").count())
check("explain shows pushdown", lambda: (
    "pushed" if "PushedFilters" in nation.filter(n_regionkey={"eq": [1]}).explain() else "NO PUSHDOWN"))
check("take_from index join", lambda: nation.project(
    {"idx": __import__("pyspark.sql.functions", fromlist=["F"]).col("n_nationkey") % 5}
).take_from("idx", nation.order(by=["n_nationkey"]).with_row_index("_rowid"), rowid="_rowid").count())


# probes: round-5 additions (graph, temporal, retrieval, planning)
check("pagerank ranks sum to 1", lambda: (
    lambda rs: "ok" if abs(sum(r["rank"] for r in rs) - 1.0) < 1e-9 else f"sum={sum(r['rank'] for r in rs)}"
)(__import__("graphique_spark.operators.graph", fromlist=["pagerank"]).pagerank(
    tables["orders"].df.selectExpr("o_custkey AS src", "o_orderkey AS dst").limit(500),
    iterations=2,
).collect()))
check("scd2_join picks latest version", lambda: __import__(
    "graphique_spark.operators.asof", fromlist=["scd2_join"]
).scd2_join(
    tables["orders"].df.selectExpr("o_orderkey", "o_custkey AS k", "o_orderdate AS ts"),
    tables["orders"].df.selectExpr("o_custkey AS k", "o_orderdate AS valid_from", "o_totalprice AS v").limit(200),
    key="k", fact_ts="ts",
).count())
check("skew_report shapes", lambda: len(__import__(
    "graphique_spark.operators.skew", fromlist=["skew_report"]
).skew_report(tables["events"].df, ["event_type"], top=3).collect()))

# probes: round-6 additions (web curation)
def _web_url_dedup():
    from pyspark.sql import functions as F

    from graphique_spark.llm.web import normalize_url, url_dedup

    urls = tables["documents"].df.selectExpr(
        "doc_id", "concat('https://', source, '.com/d/', doc_id % 7, '?utm_source=x') AS url"
    )
    kept = url_dedup(urls, "url", "doc_id").count()
    want = urls.select(normalize_url(F.col("url"))).distinct().count()
    if kept != want:
        raise AssertionError(f"kept {kept}, distinct normalized {want}")
    return kept


def _web_blocklist():
    from graphique_spark.llm.web import domain_blocklist_filter, url_host

    urls = tables["documents"].df.selectExpr(
        "doc_id", "concat('https://www.', source, '.com/x') AS url"
    )
    total = urls.count()
    kept = domain_blocklist_filter(urls, "url", ["src1.com"])
    n_kept = kept.count()
    if not 0 < n_kept < total:
        raise AssertionError(f"kept {n_kept} of {total}: nothing blocked or everything")
    from pyspark.sql import functions as F

    leaked = kept.where(url_host(F.col("url")).endswith("src1.com")).count()
    if leaked:
        raise AssertionError(f"{leaked} blocked-domain rows survived")
    return f"blocked {total - n_kept}/{total}"


def _web_html_strip():
    from pyspark.sql import functions as F

    from graphique_spark.llm.web import html_text

    leaked = tables["documents"].df.select(
        html_text(
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p><script>x</script>"))
        ).alias("t")
    ).where(F.col("t").contains("<p>") | F.col("t").contains("script")).count()
    if leaked:
        raise AssertionError(f"{leaked} rows still contain tag/script residue")
    return 0


check("url normalize + dedup == distinct normalized", _web_url_dedup)
check("domain blocklist drops suffix matches (and only those)", _web_blocklist)
check("html_text strips tags", _web_html_strip)


# probes: round-11 additions (runnable toSql)


def _tosql_roundtrip():
    from graphique_spark.sources import read_parquet

    ds = (
        read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
        .filter(o_orderstatus={"eq": ["F"]})
        .group(["o_orderpriority"], counts="n")
        .order(["o_orderpriority"])
    )
    sql = ds.to_sql()
    if not sql.startswith("SELECT"):
        raise AssertionError(f"toSql fell back to a plan dump:\n{sql}")
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in ds.df.collect()]
    if got != want:
        raise AssertionError(f"rendered SQL diverges: {got[:2]} vs {want[:2]}")
    return len(got)


check("toSql renders runnable SQL reproducing the frame", _tosql_roundtrip)


failures = [c for c in checks if c[1] == "FAIL"]
print(f"\n{len(checks) - len(failures)}/{len(checks)} OK")
raise SystemExit(1 if failures else 0)
