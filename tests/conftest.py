import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

# Default-vs-full test budget (VERDICT r12 item 2): the plain
# ``pytest tests/ -x -q`` run must fit an unattended verify window (the
# round-12 driver run was truncated at ~63% with zero failures — a
# process regression, not a code one). The heavy tails — hypothesis
# fuzzer example counts and a handful of multi-minute e2e streaming
# sinks whose mechanism is covered by faster siblings — run in full only
# when GRAPHIQUE_FULL_TESTS=1 (builder sessions set it; every property
# and operator keeps at least one default-mode test).
FULL_TESTS = bool(os.environ.get("GRAPHIQUE_FULL_TESTS"))

#: hypothesis example budget: full_n with GRAPHIQUE_FULL_TESTS=1, quick_n
#: otherwise. The property itself (differential vs DuckDB, SQL-render
#: roundtrip) is exercised either way; only the random-search depth drops.
def fuzz_examples(full_n: int, quick_n: int) -> int:
    return full_n if FULL_TESTS else quick_n


#: marker for multi-minute e2e tests whose mechanism has a faster default
#: sibling; skipped unless GRAPHIQUE_FULL_TESTS=1
slow_full = pytest.mark.skipif(
    not FULL_TESTS,
    reason="multi-minute e2e covered by a faster sibling by default; "
    "set GRAPHIQUE_FULL_TESTS=1 for the full-fidelity run",
)
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from graphique_spark import get_session

    session = get_session(master="local[4]", shuffle_partitions=4, app_name="tests")
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="session")
def tables(spark):
    from graphique_spark.sources import load_tables

    return load_tables(spark, SF_DIR, TABLES)


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con
