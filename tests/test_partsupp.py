"""partsupp-dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20) vs DuckDB.

The driver testdata ships no partsupp.parquet (FIXTURES.md section 8), so
these queries are verified here against a deterministic micro-fixture:
sf0.001 tables symlinked into a tmp root plus a generated partsupp that
honors TPC-H's invariant that every lineitem (partkey, suppkey) pair
exists in partsupp (otherwise Q9/Q20 would be vacuously near-empty),
padded with deterministic extra suppliers per part.  The moment a real
driver fixture appears at every scale root, graphique_spark.suite_partsupp
merges the same queries into the driver-facing suite unchanged.
"""

import math
import os

import duckdb
import pytest

from graphique_spark.suite_partsupp import PARTSUPP_ORACLES, PARTSUPP_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def partsupp_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("partsupp_sf")
    for name in TABLES:
        os.symlink(f"{SF_DIR}/{name}.parquet", root / f"{name}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          WITH pairs AS (
            SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            UNION
            SELECT p_partkey,
                   (p_partkey * 7 + i * 13)
                     % (SELECT count(*) FROM read_parquet('{SF_DIR}/supplier.parquet'))
                     + 1
            FROM read_parquet('{SF_DIR}/part.parquet'), range(4) t(i)
          )
          SELECT ps_partkey, ps_suppkey,
                 CAST((ps_partkey * 31 + ps_suppkey * 17) % 5000 + 1 AS BIGINT)
                   AS ps_availqty,
                 CAST((ps_partkey * 13 + ps_suppkey * 7) % 100000 AS DOUBLE) / 100.0
                   + 1.0 AS ps_supplycost
          FROM pairs
        ) TO '{root}/partsupp.parquet' (FORMAT PARQUET)
        """
    )
    return str(root)


@pytest.fixture(scope="session")
def partsupp_oracle(partsupp_dir):
    con = duckdb.connect()
    for name in TABLES + ["partsupp"]:
        con.execute(
            f"CREATE VIEW {name} AS"
            f" SELECT * FROM read_parquet('{partsupp_dir}/{name}.parquet')"
        )
    return con


def _norm(value):
    if isinstance(value, float):
        return "NaN" if math.isnan(value) else f"{value:.12g}"
    return value


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(str(_norm(row[i])) for i in order) for row in rows)


@pytest.mark.parametrize("name", sorted(PARTSUPP_QUERIES))
def test_partsupp_query_matches_duckdb(spark, partsupp_dir, partsupp_oracle, name):
    sdf = PARTSUPP_QUERIES[name](spark, partsupp_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    cur = partsupp_oracle.execute(PARTSUPP_ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert len(srows) > 0, f"{name}: vacuous (0 rows) — loosen its filters"
    assert _canon(srows, scols) == _canon(orows, ocols)


def test_registry_gated_on_driver_fixture():
    """The queries must NOT be in the driver-facing suite while the driver
    testdata lacks partsupp.parquet (a red driver row would be worse than
    absence), and must all carry oracles for the day they merge."""
    from graphique_spark import suite
    from graphique_spark.suite_partsupp import partsupp_available

    assert set(PARTSUPP_ORACLES) == set(PARTSUPP_QUERIES)
    if not partsupp_available():
        assert not (set(PARTSUPP_QUERIES) & set(suite.QUERIES))
    else:  # pragma: no cover - flips when the fixture ships
        assert set(PARTSUPP_QUERIES) <= set(suite.QUERIES)


def test_partsupp_plans_scalable(spark, partsupp_dir):
    """Same screen the main suite gets from test_plan_lint: no cartesian
    products or row-at-a-time Python eval; the only nested-loop join is
    q11's deliberate 1-row scalar-total broadcast cross (the q15 pattern)."""
    from graphique_spark.plans import plan_string

    for name, fn in sorted(PARTSUPP_QUERIES.items()):
        plan = plan_string(fn(spark, partsupp_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        if name != "q11_important_stock":
            assert "BroadcastNestedLoopJoin" not in plan, name
        spark.catalog.clearCache()
