"""Scalar function semantics vs reference behavior (reference
test_service.py:85-87 capitalize, test_models.py:149-151 slice, etc.)."""

import pytest
from pyspark.sql import functions as F

from graphique_spark.functions import arrays, numeric, strings, temporal


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def eval1(df, col):
    return df.select(col.alias("x")).first()["x"]


def test_capitalize_whole_string(one):
    # "NY" -> "Ny" (not initcap's per-word behavior)
    assert eval1(one, strings.capitalize(F.lit("NY"))) == "Ny"
    assert eval1(one, strings.capitalize(F.lit("new york"))) == "New york"


def test_split_literal_vs_regex(one):
    assert eval1(one, strings.split(F.lit("a.b.c"), ".")) == ["a", "b", "c"]
    assert eval1(one, strings.re_split(F.lit("a1b22c"), "[0-9]+")) == ["a", "b", "c"]


def test_find_zero_based(one):
    assert eval1(one, strings.find(F.lit("hello"), "ll")) == 2
    assert eval1(one, strings.find(F.lit("hello"), "zz")) == -1


def test_strip_chars(one):
    assert eval1(one, strings.strip(F.lit("xxhixx"), "x")) == "hi"
    assert eval1(one, strings.lstrip(F.lit("xxhi"), "x")) == "hi"


def test_bucket_edges(one):
    edges = [0, 10, 20]
    b = lambda v, **kw: eval1(one, numeric.bucket(F.lit(v), edges, **kw))  # noqa: E731
    assert b(0) == 0
    assert b(10) == 1
    assert b(20) == 1  # close_extreme includes the max edge
    assert b(25) is None
    assert b(25, include_over=True) == 2
    assert b(-5, include_under=True) == 0
    assert b(5, include_under=True) == 1  # indices shift with underflow bucket


def test_isinf_and_log(one):
    assert eval1(one, numeric.isinf(F.lit(float("inf")))) is True
    assert eval1(one, numeric.isinf(F.lit(1.0))) is False
    assert eval1(one, numeric.log(F.lit(8.0), base=2)) == pytest.approx(3.0)


def test_array_functions(one):
    arr = F.array(F.lit(3), F.lit(1), F.lit(2), F.lit(1))
    assert eval1(one, arrays.arr_sort(arr)) == [1, 1, 2, 3]
    assert eval1(one, arrays.arr_unique(arr)) in ([3, 1, 2], [1, 2, 3])
    assert eval1(one, arrays.sums(arr)) == 7.0
    assert eval1(one, arrays.means(arr)) == pytest.approx(1.75)
    assert eval1(one, arrays.modes(arr)) == 1
    assert eval1(one, arrays.arr_index(arr, 2)) == 2
    assert eval1(one, arrays.arr_index(arr, 99)) == -1
    assert eval1(one, arrays.value_at(arr, 0)) == 3
    assert eval1(one, arrays.value_at(arr, -1)) == 1


def test_array_slice_negative_offset(one):
    arr = F.array(*[F.lit(i) for i in range(5)])
    assert eval1(one, arrays.arr_slice(arr, 1, 2)) == [1, 2]
    assert eval1(one, arrays.arr_slice(arr, -2)) == [3, 4]
    assert eval1(one, arrays.arr_slice(arr, 2)) == [2, 3, 4]


def test_alls_anys(one):
    tt = F.array(F.lit(True), F.lit(True))
    tf = F.array(F.lit(True), F.lit(False))
    assert eval1(one, arrays.alls(tt)) is True
    assert eval1(one, arrays.alls(tf)) is False
    assert eval1(one, arrays.anys(tf)) is True


def test_temporal_parts(one):
    ts = F.lit("2024-03-15 13:45:30").cast("timestamp")
    assert eval1(one, temporal.year(ts)) == 2024
    assert eval1(one, temporal.quarter(ts)) == 1
    assert eval1(one, temporal.day_of_year(ts)) == 75
    assert eval1(one, temporal.strftime(ts, "%Y-%m")) == "2024-03"
    assert eval1(one, temporal.time_of_day(ts)) == (13 * 3600 + 45 * 60 + 30) * 1_000_000
    assert eval1(one, temporal.delta(ts, F.lit("2024-03-16 13:45:30").cast("timestamp"), "day")) == 1


def test_kurtosis_sample_matches_duckdb(tables, oracle):
    from graphique_spark import Agg

    got = (
        tables["orders"]
        .group(aggregate=[Agg("kurtosis", "o_totalprice", alias="k")])
        .df.first()["k"]
    )
    want = oracle.execute("SELECT kurtosis(o_totalprice) FROM orders").fetchone()[0]
    assert got == pytest.approx(want, rel=1e-9)


def test_equidepth_histogram_balanced_and_total(spark):
    from graphique_spark.functions.numeric import equidepth_histogram

    df = spark.range(1000).select((F.col("id") * 7 % 1000).cast("double").alias("v"))
    out = equidepth_histogram(df, "v", buckets=10).collect()
    assert len(out) == 10
    assert sum(r["n"] for r in out) == 1000
    assert all(95 <= r["n"] <= 105 for r in out)  # near-equal depth
    by_bucket = sorted(out, key=lambda r: r["bucket"])
    for prev, cur in zip(by_bucket, by_bucket[1:]):
        assert prev["hi"] <= cur["lo"]  # non-overlapping, ordered ranges


def test_group_sample_k_deterministic_and_bounded(spark, tables):
    from graphique_spark.llm.text import group_sample_k

    docs = tables["documents"].df
    a = group_sample_k(docs, by="lang", k=3).select("lang", "doc_id").collect()
    b = group_sample_k(docs, by="lang", k=3).select("lang", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    from collections import Counter

    per = Counter(r["lang"] for r in a)
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(3, sizes[lang])


def test_variant_shred_nested_paths_and_dirty_values(spark):
    from graphique_spark.functions import variant as V

    rows = [
        (1, '{"meta": {"tags": ["a", "b"], "score": 1.5}, "src": "web"}'),
        (2, '{"meta": {"tags": [], "score": "oops"}, "src": "pdf"}'),  # uncastable
        (3, '{"src": "api"}'),  # missing meta entirely
    ]
    df = spark.createDataFrame(rows, "id long, js string")
    out = {
        r["id"]: r
        for r in V.shred_variant(
            df.select("id", V.to_variant("js").alias("v")),
            "v",
            {
                "src": ("$.src", "string"),
                "score": ("$.meta.score", "double"),
                "first_tag": ("$.meta.tags[0]", "string"),
                "n_tags": ("$.meta.tags", "array<string>"),
            },
        ).collect()
    }
    assert out[1]["src"] == "web" and out[1]["score"] == 1.5
    assert out[1]["first_tag"] == "a" and out[1]["n_tags"] == ["a", "b"]
    # dirty values and missing paths become null, not job failures
    assert out[2]["score"] is None and out[2]["first_tag"] is None
    assert out[3]["score"] is None and out[3]["n_tags"] is None
    # the variant column is dropped unless keep=True (open documents must
    # not ride through downstream shuffles by accident)
    cols = V.shred_variant(
        df.select("id", V.to_variant("js").alias("v")), "v", {"src": ("$.src", "string")}
    ).columns
    assert cols == ["id", "src"]
    # strict mode raises on the uncastable value
    import pytest as _pytest

    strict = df.select(V.variant_field(V.to_variant("js"), "$.meta.score", "double", strict=True))
    with _pytest.raises(Exception):
        strict.collect()


def test_array_sums_means_skip_nulls(spark):
    from graphique_spark.functions.arrays import means, sums

    df = spark.createDataFrame(
        [([1.0, None, 3.0],), ([None],), ([],)], "a array<double>"
    )
    rows = df.select(sums(F.col("a")).alias("s"), means(F.col("a")).alias("m")).collect()
    assert (rows[0]["s"], rows[0]["m"]) == (4.0, 2.0)
    assert (rows[1]["s"], rows[1]["m"]) == (None, None)
    assert (rows[2]["s"], rows[2]["m"]) == (None, None)
