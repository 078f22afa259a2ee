"""``toSql`` fidelity: the rendered SQL must be *executable* Spark SQL that
reproduces the compiled DataFrame exactly (reference ``toSql``,
interface.py:109-115, returns runnable dialect SQL via ibis/SQLGlot —
exercised in reference tests/test_service.py). Every document here is
compiled twice: once through the GraphQL resolvers to a DataFrame, once by
``spark.sql`` over the rendered text, and the row sets must match."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def service(spark, tables):
    from graphique_spark.service import GraphQLService

    svc = GraphQLService(
        {name: tables[name] for name in ["orders", "customer", "nation", "events", "embeddings"]}
    )
    for name, ds in svc.roots.items():  # named roots run against temp views
        ds.df.createOrReplaceTempView(name)
    return svc


CHAIN_DOCS = [
    # filter -> group with aggregate + counts
    """{ orders { filter(o_orderstatus: {eq: ["F"]}) {
         group(by: ["o_orderpriority"], counts: "n",
               aggregate: {sum: [{name: "o_totalprice", alias: "rev"}]}) { count } } } }""",
    # project expression -> filter on computed column -> group
    """{ orders { project(columns: [{alias: "big",
           expr: {gt: [{name: "o_totalprice"}, {value: 150000}]}}]) {
         filter(big: {eq: [true]}) { group(by: ["o_orderstatus"], counts: "n") { count } } } } }""",
    # order + limit
    """{ orders { filter(o_totalprice: {gt: 100000}) {
         order(by: ["-o_totalprice", "o_orderkey"], limit: 7) { count } } } }""",
    # per-group top-k (order with over)
    """{ orders { order(by: ["-o_totalprice"], limit: 2, over: ["o_orderpriority"]) {
         group(by: ["o_orderpriority"], counts: "n") { count } } } }""",
    # first (rank filter with ties)
    """{ orders { first(by: ["-o_totalprice"], rank: 3, over: ["o_orderstatus"]) { count } } }""",
    # broadcast join -> group
    """{ orders { join(right: "customer", keys: ["o_custkey"], rkeys: ["c_custkey"],
                        broadcast: true) {
         group(by: ["c_mktsegment"], counts: "n") { count } } } }""",
    # USING-style join (same key names) via self-join of customer on nation
    """{ customer { join(right: "nation", keys: ["c_nationkey"], rkeys: ["n_nationkey"],
                          how: "left") {
         group(by: ["n_name"], counts: "n") { count } } } }""",
    # distinct with deterministic tiebreak + counts
    """{ orders { distinct(on: ["o_orderpriority"], orderBy: ["-o_totalprice", "o_orderkey"],
                           counts: "cnt") { count } } }""",
    # rollup
    """{ orders { rollup(by: ["o_orderstatus", "o_orderpriority"], counts: "n") { count } } }""",
    # cube
    """{ orders { cube(by: ["o_orderstatus"], counts: "n") { count } } }""",
    # cast -> global aggregate
    """{ orders { cast(schema: [{name: "o_totalprice", type: "bigint"}]) {
         group(aggregate: {sum: [{name: "o_totalprice", alias: "s"}],
                           mean: [{name: "o_totalprice", alias: "m"}]}) { count } } } }""",
    # fillNull / dropNull
    """{ orders { fillNull(value: 0, subset: ["o_totalprice"]) {
         dropNull(subset: ["o_orderdate"]) { group(counts: "n") { count } } } } }""",
    # union (self) + distinct flag
    """{ orders { union(tables: ["orders"], distinct: true) { group(counts: "n") { count } } } }""",
    # intersect / difference
    """{ orders { intersect(table: "orders") { group(counts: "n") { count } } } }""",
    """{ orders { difference(table: "orders") { group(counts: "n") { count } } } }""",
    # unnest with offset -> aggregate
    """{ embeddings { unnest(name: "embedding", offset: "pos") {
         group(aggregate: {sum: [{name: "embedding", alias: "s"}],
                           max: [{name: "pos", alias: "m"}]}) { count } } } }""",
    # window function in a project expression -> filter
    """{ orders { project(columns: [{alias: "rnk", expr: {call: {func: "rank",
           options: {over: ["o_orderpriority"], orderBy: ["-o_totalprice"]}}}}]) {
         filter(rnk: {le: 2}) { group(by: ["o_orderpriority"], counts: "n") { count } } } } }""",
    # ordered collect aggregates (array_sort default comparator strip)
    """{ orders { group(by: ["o_orderpriority"],
           aggregate: {first: [{name: "o_totalprice", alias: "fp", orderBy: "o_orderdate"}],
                       concat: [{name: "o_orderstatus", alias: "cc", orderBy: "-o_orderdate",
                                 sep: "|"}]}) { count } } }""",
    # slice after order (offset + limit)
    """{ orders { order(by: ["o_orderkey"]) { slice(offset: 5, limit: 10) { count } } } }""",
    # typed filters combined with expression where
    """{ events { filter(event_type: {eq: ["click", "view"]}, value: {ge: 0.1},
           where: {ne: [{name: "user_id"}, {value: 7}]}) {
         group(by: ["event_type"], counts: "n") { count } } } }""",
    # argmax/argmin with per-agg where
    """{ events { group(by: ["user_id"],
           aggregate: {argmax: [{name: "value", key: "ts", alias: "latest"}],
                       count: [{name: "event_id", alias: "clicks",
                                where: {eq: [{name: "event_type"}, {value: "click"}]}}]}) {
         order(by: ["user_id"], limit: 10) { count } } } }""",
]


def _rows(df):
    return sorted(map(lambda r: tuple(map(str, r)), df.collect()))


@pytest.mark.parametrize("doc", CHAIN_DOCS, ids=range(len(CHAIN_DOCS)))
def test_roundtrip(spark, service, doc):
    from graphique_spark.service.translate import compile_dataset

    ds = compile_dataset(service, doc)
    sql = ds.to_sql()
    assert sql.startswith("SELECT"), f"expected rendered SQL, got fallback:\n{sql}"
    assert spark.sql(sql).columns == ds.df.columns
    assert _rows(spark.sql(sql)) == _rows(ds.df)


def test_service_tosql_field_is_runnable(spark, service):
    data = service.execute(
        """{ orders { filter(o_orderstatus: {eq: ["F"]}) {
              group(by: ["o_orderpriority"], counts: "n") { toSql } } } }"""
    )
    sql = data["orders"]["filter"]["group"]["toSql"]
    assert sql.startswith("SELECT")
    from graphique_spark.service.translate import compile_dataset

    direct = compile_dataset(
        service,
        """{ orders { filter(o_orderstatus: {eq: ["F"]}) {
              group(by: ["o_orderpriority"], counts: "n") { count } } } }""",
    )
    assert _rows(spark.sql(sql)) == _rows(direct.df)


def test_parquet_root_renders_standalone(spark):
    """read_parquet roots render as parquet.`path` scans — runnable with no
    registered views at all."""
    from graphique_spark.sources import read_parquet

    ds = read_parquet(spark, f"{SF_DIR}/nation.parquet").filter(n_regionkey={"eq": [1]})
    sql = ds.to_sql()
    assert "parquet.`" in sql
    assert _rows(spark.sql(sql)) == _rows(ds.df)


def test_startup_projection_rename_renders(spark):
    from graphique_spark.sources import read_parquet

    ds = read_parquet(spark, f"{SF_DIR}/nation.parquet", columns={"key": "n_nationkey", "name": "n_name"})
    sql = ds.to_sql()
    assert spark.sql(sql).columns == ["key", "name"]
    assert _rows(spark.sql(sql)) == _rows(ds.df)


def test_unrenderable_falls_back_to_plan_dump(spark, service):
    """Chains through an operator with no SQL equivalent (asofJoin) fall
    back to the optimized-plan dump instead of rendering wrong SQL."""
    from graphique_spark.service.translate import compile_dataset

    ds = compile_dataset(
        service,
        """{ events { asofJoin(right: "events", on: "ts", keys: ["user_id"]) { count } } }""",
    )
    sql = ds.to_sql()
    assert not sql.startswith("SELECT")  # plan dump, not SQL text


def test_nondeterministic_distinct_falls_back(spark, service):
    """distinct with an arbitrary tiebreak (no orderBy) has no deterministic
    SQL equivalent and must not render."""
    from graphique_spark.service.translate import compile_dataset

    ds = compile_dataset(
        service, """{ orders { distinct(on: ["o_orderpriority"]) { count } } }"""
    )
    assert not ds.to_sql().startswith("SELECT")


def test_sql_escape_hatch_renders_as_cte(spark, tables):
    from graphique_spark.service import GraphQLService

    svc = GraphQLService({"orders": tables["orders"]}, allow_sql=True)
    svc.roots["orders"].df.createOrReplaceTempView("orders")
    from graphique_spark.service.translate import compile_dataset

    ds = compile_dataset(
        svc,
        """{ orders { sql(query: "SELECT o_orderstatus, count(1) AS n FROM self GROUP BY 1") {
              order(by: ["o_orderstatus"]) { count } } } }""",
    )
    sql = ds.to_sql()
    assert sql.startswith("SELECT")
    assert _rows(spark.sql(sql)) == _rows(ds.df)
