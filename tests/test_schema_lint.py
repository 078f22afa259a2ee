"""Output-schema lint: no registered query may return an Array, Map,
Struct, or Decimal column. The driver's correctness gate canonicalizes
results through pandas — ``sort_values`` raises ``TypeError: unhashable
type: 'list'`` on list-typed columns, and DECIMAL/HUGEINT silently
lossy-casts to float64 (so an exactly-correct checksum hash-mismatches).
Round 6 shipped two such queries (`image_channel_histograms`,
`table_checksum_audit`); both were strict-correct but driver-red purely
on representation. This lint keeps that class closed: explode arrays to
scalar rows and bound big integers into int64 before registering.
"""

import pytest

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

SF_DIR = "/root/testdata/sf0.001"

#: driver-hostile column types (see module doc)
BANNED = (ArrayType, MapType, StructType, DecimalType)


@pytest.fixture(scope="module")
def schemas(spark):
    from graphique_spark.suite import QUERIES
    import graphique_spark.suite_llm  # noqa: F401
    import graphique_spark.suite_streaming  # noqa: F401

    out = {}
    for name, fn in QUERIES.items():
        # unlike the plan lint, NOTHING is skipped: the driver can sample
        # any registered query, so every output schema must be hashable.
        # e2e queries (streaming, roundtrips) execute their pipelines at
        # sf0.001 here — the cost buys the guarantee.
        out[name] = fn(spark, SF_DIR).schema
        spark.catalog.clearCache()
    return out


def test_no_driver_hostile_output_columns(schemas):
    offenders = {
        name: [(f.name, f.dataType.simpleString()) for f in schema.fields
               if isinstance(f.dataType, BANNED)]
        for name, schema in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, (
        "queries returning Array/Map/Struct/Decimal columns (the driver's "
        f"pandas canonicalizer cannot hash these): {offenders}"
    )


def test_every_query_is_oracle_paired():
    """199/199: every registered query has a DuckDB oracle SQL string (the
    last unpaired one, similarity_ivf_trained, gained a floored-boolean
    oracle in round 7). A new query without an oracle only gets the
    driver's weak rows-only check — this keeps the full-strength gate the
    default."""
    from graphique_spark.suite import ORACLES, QUERIES
    import graphique_spark.suite_llm  # noqa: F401
    import graphique_spark.suite_streaming  # noqa: F401

    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries without a DuckDB oracle: {missing}"
