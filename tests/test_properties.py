"""Property-based tests (hypothesis): operator semantics checked against
brute-force Python models on generated inputs — the corners fixtures miss
(empty frames, all-equal keys, negative offsets, unmatched asof rows).
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from graphique_spark.dataset import Dataset
from graphique_spark.operators.asof import asof_join

SETTINGS = dict(max_examples=12, deadline=None)

rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-5, 5)),
    min_size=0,
    max_size=25,
)


@settings(**SETTINGS)
@given(left=rows_strategy, right=rows_strategy, tol=st.one_of(st.none(), st.integers(0, 10)))
def test_asof_join_matches_bruteforce(spark, left, right, tol):
    ldf = spark.createDataFrame(left or [(0, 0, 0)], "k int, t int, lv int")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k int, t int, rv int")
    if not right:
        rdf = rdf.limit(0)
    got = {
        (r["k"], r["t"], r["lv"]): r["rv"]
        for r in asof_join(
            ldf, rdf, on="t", by=["k"], tolerance=F.lit(tol) if tol is not None else None
        ).collect()
    }
    for k, t, lv in left:
        cands = [
            (rt, rv)
            for (rk, rt, rv) in right
            if rk == k and rt <= t and (tol is None or t - rt <= tol)
        ]
        expected = max(cands)[1] if cands else None
        # duplicate (k,t) right rows: any max-t value is a valid match
        valid = {rv for (rt, rv) in cands if cands and rt == max(cands)[0]} or {None}
        assert got[(k, t, lv)] in valid


@settings(**SETTINGS)
@given(
    values=st.lists(st.integers(-100, 100), min_size=0, max_size=30),
    offset=st.integers(-35, 35),
    limit=st.one_of(st.none(), st.integers(0, 35)),
)
def test_slice_matches_python(spark, values, offset, limit):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows or [(0, 0)], "i int, v int").coalesce(1)
    if not rows:
        df = df.limit(0)
    ds = Dataset(df.orderBy("i"))
    got = [r["v"] for r in ds.slice(offset, limit).df.collect()]
    start = offset if offset >= 0 else max(len(values) + offset, 0)
    expected = values[start:] if limit is None else values[start : start + limit]
    assert got == expected


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 5)), min_size=0, max_size=25
    ),
    keep=st.sampled_from(["first", "last"]),
)
def test_distinct_keep_matches_model(spark, rows, keep):
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data or [(0, 0, 0)], "k int, v int, o int")
    if not data:
        df = df.limit(0)
    out = Dataset(df).distinct(on=["k"], keep=keep, order_by=["o"]).df.collect()
    expected = {}
    for k, v, o in data:
        if k not in expected or (o > expected[k][1]) == (keep == "last"):
            expected[k] = (v, o)
    assert {(r["k"], r["v"], r["o"]) for r in out} == {
        (k, v, o) for k, (v, o) in expected.items()
    }


@settings(**SETTINGS)
@given(values=st.lists(st.integers(0, 5), min_size=0, max_size=40))
def test_row_index_dense_and_ordered(spark, values):
    from graphique_spark.operators.sequence import with_row_index

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows or [(0, 0)], "i int, v int").repartition(4)
    if not rows:
        df = df.limit(0)
    out = with_row_index(df, "rid").collect()
    rids = sorted(r["rid"] for r in out)
    assert rids == list(range(len(rows)))  # dense 0..n-1, no gaps or dupes


@settings(**SETTINGS)
@given(keys=st.lists(st.integers(0, 3), min_size=0, max_size=40))
def test_run_ids_match_sequential_model(spark, keys):
    from graphique_spark.operators.sequence import with_run_ids

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows or [(0, 0)], "o int, k int").repartition(3)
    if not rows:
        df = df.limit(0)
    out = sorted(
        (r["o"], r["_run"]) for r in with_run_ids(df, by=["k"], order_by=["o"]).collect()
    )
    expected, run = [], -1
    for i, k in enumerate(keys):
        if i == 0 or k != keys[i - 1]:
            run += 1
        expected.append((i, run))
    assert out == expected


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=0,
        max_size=30,
    )
)
def test_star_components_match_union_find(spark, edges):
    from graphique_spark.llm.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    # ground truth: sequential union-find with min-label roots
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for a, b in edges:
        for v in (a, b):
            expect[v] = find(v)
    # path-compress to true roots
    expect = {v: find(r) for v, r in expect.items()}

    pairs = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        pairs = pairs.limit(0)
    got = {
        r["v"]: r["component"]
        for r in connected_components(pairs, method="star").collect()
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_jaccard_exact_wrt_threshold(spark, docs, threshold):
    # PPJoin prefix filtering must be EXACT w.r.t. the threshold: every
    # pair with true n-gram Jaccard >= t, no pair below it
    from graphique_spark.llm.dedup import ngram_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, min_jaccard=threshold).collect()
    }

    def bigrams(t):
        w = t.split()
        if len(w) < 2:
            return {" ".join(w)}
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    expect = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = bigrams(a), bigrams(b)
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                expect[(i, j)] = jac
    assert set(got) == set(expect)
    for pair, jac in expect.items():
        assert got[pair] == pytest.approx(jac, abs=1e-9)


@settings(**SETTINGS)
@given(
    facts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=20),
    dims=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12),
)
def test_scd2_join_matches_bruteforce(spark, facts, dims):
    from graphique_spark.operators.asof import scd2_join

    dims = sorted({(k, vf) for k, vf in dims})
    ddf = spark.createDataFrame(
        [(k, vf, f"v{k}_{vf}") for k, vf in dims], "k int, valid_from int, tag string"
    )
    fdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(facts)] or [(0, 0, 0)],
        "fid int, k int, ts int",
    )
    if not facts:
        fdf = fdf.limit(0)
    got = {
        r["fid"]: r["tag"]
        for r in scd2_join(fdf, ddf, key="k", fact_ts="ts").collect()
    }
    for i, (k, t) in enumerate(facts):
        versions = [(vf, f"v{vk}_{vf}") for vk, vf in dims if vk == k and vf <= t]
        expect = max(versions)[1] if versions else None
        assert got.get(i) == expect


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_remove_duplicate_segments_idempotent(spark, texts):
    from graphique_spark.llm import dedup as dd

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = dd.remove_duplicate_segments(df, seg_words=3)
    rows1 = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    again = dd.remove_duplicate_segments(
        spark.createDataFrame(list(rows1.items()) or [(0, "")], "doc_id long, text string"),
        seg_words=3,
    )
    rows2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    # a deduped corpus has no corpus-repeated segments left... except that
    # re-segmentation after removal can form NEW segment boundaries; the
    # invariant that must hold is containment: pass 2 never re-grows text
    for d, t2 in rows2.items():
        assert len(t2) <= len(rows1[d])


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=4, max_size=20).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    t=st.sampled_from([0.6, 0.8, 1.0]),
)
def test_containment_prefix_filter_exact(spark, texts, t):
    """The inner-prefix candidate filter must lose NO qualifying pair vs
    brute force — same exactness contract as the PPJoin property test."""
    from graphique_spark.llm import dedup as dd

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["id_in"], r["id_out"])
        for r in dd.containment_pairs(df, n=3, min_containment=t).collect()
    }

    def grams(s):
        ws = s.split()
        n = max(len(ws) - 2, 1)
        return {" ".join(ws[i : i + 3]) for i in range(n)}

    want = set()
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i != j and len(grams(a) & grams(b)) / len(grams(a)) >= t:
                want.add((i, j))
    assert got == want


agg_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                     # group
        st.one_of(st.none(), st.integers(-9, 9)),  # value (nullable)
        st.integers(0, 9),                     # order key
        st.booleans(),                         # where flag
    ),
    min_size=1,
    max_size=25,
)


@settings(**SETTINGS)
@given(rows=agg_rows)
def test_ordered_collect_first_argmax_match_model(spark, rows):
    """Ordered collect / first / argmax against a Python model: the
    per-agg where filter must exclude rows from ordering AND ranking, and
    null values must drop out like the unordered collect_list path."""
    from graphique_spark.inputs import Agg

    df = spark.createDataFrame(rows, "g int, v int, t int, ok boolean")
    out = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            Agg("collect", "v", order_by=["t", "v"], alias="c").to_column(),
            Agg("first", "v", order_by=["t", "v"], where=F.col("ok"), alias="f").to_column(),
            Agg("argmax", "v", key="t", where=F.col("ok"), alias="am").to_column(),
        )
        .collect()
    }
    import collections

    groups = collections.defaultdict(list)
    for g, v, t, ok in rows:
        groups[g].append((v, t, ok))
    for g, members in groups.items():
        ordered = sorted(
            [(t, v) for v, t, ok in members if v is not None],
            key=lambda tv: (tv[0], tv[1]),
        )
        assert out[g]["c"] == [v for _, v in ordered], (g, members)
        kept = sorted(
            [(t, v) for v, t, ok in members if ok and v is not None],
            key=lambda tv: (tv[0], tv[1] if tv[1] is not None else 10**9),
        )
        assert out[g]["f"] == (kept[0][1] if kept else None), (g, members)
        ranked = [(t, v) for v, t, ok in members if ok]
        if ranked:
            best_t = max(t for t, _ in ranked)
            valid = {v for t, v in ranked if t == best_t}
            assert out[g]["am"] in valid, (g, members)
        else:
            assert out[g]["am"] is None


diff_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),  # nullable key
        st.integers(0, 3),                        # second key
        st.integers(0, 5),                        # payload
    ),
    min_size=0,
    max_size=15,
)


@settings(**SETTINGS)
@given(old=diff_rows, new=diff_rows)
def test_snapshot_diff_matches_set_model(spark, old, new):
    from graphique_spark.operators.diff import snapshot_diff

    if not old and not new:
        return
    odf = spark.createDataFrame(old or [(0, 0, 0)], "k1 int, k2 int, v int")
    ndf = spark.createDataFrame(new or [(0, 0, 0)], "k1 int, k2 int, v int")
    if not old:
        odf = odf.limit(0)
    if not new:
        ndf = ndf.limit(0)
    got = {
        (r["k1"], r["k2"]): r["change"]
        for r in snapshot_diff(odf, ndf, ["k1", "k2"], include_unchanged=True).collect()
    }
    import collections

    om = collections.defaultdict(list)
    nm = collections.defaultdict(list)
    for k1, k2, v in old:
        om[(k1, k2)].append(v)
    for k1, k2, v in new:
        nm[(k1, k2)].append(v)
    for key in set(om) | set(nm):
        if key not in om:
            expect = "added"
        elif key not in nm:
            expect = "removed"
        elif sorted(om[key]) == sorted(nm[key]):
            expect = "unchanged"
        else:
            expect = "changed"
        assert got[key] == expect, (key, old, new)
    assert set(got) == set(om) | set(nm)


cdc_ops = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),  # nullable key
        st.integers(1, 6),                        # seq
        st.sampled_from(["insert", "update", "delete", None]),
        st.integers(0, 9),                        # payload
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # one op per (key, seq)
)


@settings(**SETTINGS)
@given(base=diff_rows, log=cdc_ops)
def test_apply_cdc_matches_sequential_model(spark, base, log):
    from graphique_spark.operators.cdc import apply_cdc

    base = [(k1, v) for k1, _, v in base][:8]
    # collapse duplicate base keys (a snapshot has unique keys)
    seen = {}
    for k, v in base:
        seen[k] = v
    base = list(seen.items())
    bdf = spark.createDataFrame(base or [(0, 0)], "k int, v int")
    if not base:
        bdf = bdf.limit(0)
    ldf = spark.createDataFrame(log or [(0, 1, "insert", 0)], "k int, seq int, op string, v int")
    if not log:
        ldf = ldf.limit(0)
    got = {r["k"]: r["v"] for r in apply_cdc(bdf, ldf, keys=["k"]).collect()}
    state = dict(base)
    import collections

    per_key = collections.defaultdict(list)
    for k, seq, op, v in log:
        per_key[k].append((seq, op, v))
    for k, entries in per_key.items():
        seq, op, v = max(entries)  # latest seq wins (unique per key)
        if op == "delete":
            state.pop(k, None)
        else:  # insert/update/None (malformed) are upserts
            state[k] = v
    assert got == state, (base, log)


@settings(**SETTINGS)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), st.integers(1, 40), min_size=1
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(0.0, 1.0, allow_nan=False),
        min_size=3,
        max_size=3,
    ),
)
def test_mixture_sample_respects_shares(spark, counts, weights):
    from graphique_spark.llm.text import mixture_sample

    if sum(weights.values()) <= 0:
        return
    rows = [
        (s_i * 1000 + i, s)
        for s_i, (s, n) in enumerate(sorted(counts.items()))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, weights)
    kept = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for s, n in counts.items():
        # zero-weight sources are excluded entirely; kept counts never
        # exceed the source's rows
        if weights.get(s, 0) == 0:
            assert s not in kept
        else:
            assert kept.get(s, 0) <= n


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(st.none(), st.integers(-100, 100)),
        ),
        min_size=1,
        max_size=40,
    ),
    n_batches=st.integers(1, 4),
)
def test_incremental_state_merge_associative(spark, rows, n_batches):
    """finalize(merge(state(batch_i))) == finalize(state(all rows)) for any
    partition of the rows into batches — the property that lets a 100 TB
    pipeline fold daily deltas instead of re-aggregating history."""
    from graphique_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_states,
    )

    aggs = {
        "n": ("count", "v"),
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
        "m": ("avg", "v"),
    }
    full = spark.createDataFrame(rows, "k int, v int")
    batches = [
        spark.createDataFrame(rows[i::n_batches] or [(0, 0)], "k int, v int")
        for i in range(n_batches)
    ]
    # an empty slice contributes an empty state, not a fabricated row
    batches = [
        b if rows[i::n_batches] else b.limit(0) for i, b in enumerate(batches)
    ]
    states = [aggregate_state(b, ["k"], aggs) for b in batches]
    merged = finalize_state(merge_states(states, ["k"]), ["k"], aggs)
    direct = finalize_state(aggregate_state(full, ["k"], aggs), ["k"], aggs)

    def snap(df):
        out = {}
        for r in df.collect():
            m = None if r["m"] is None else round(r["m"], 9)
            out[r["k"]] = (r["n"], r["s"], r["lo"], r["hi"], m)
        return out

    assert snap(merged) == snap(direct), rows


# ---------------------------------------------------------------------------
# URL normalization properties


@settings(max_examples=25, deadline=None)
@given(
    urls=st.lists(
        st.one_of(
            # URL-shaped: random case, optional userinfo/port/params/fragment
            st.tuples(
                st.sampled_from(["http", "https", "HTTPS", "ftp"]),
                st.sampled_from(["", "u:p@"]),
                st.sampled_from(["A.b.C.com", "x.co.uk", "h", "spam.bad.net"]),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                st.sampled_from(["", "/", "/P/q", "/docs/1"]),
                st.sampled_from(
                    ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=c&fbclid=z"]
                ),
                st.sampled_from(["", "#f", "#sec?x=1"]),
            ).map(lambda t: t[0] + "://" + "".join(t[1:])),
            # junk that must pass through untouched
            st.sampled_from(["", "not a url", "owner@example.com", "a:b:c"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_normalize_url_idempotent_and_host_stable(spark, urls):
    """normalize_url is a canonicalizer: applying it twice equals applying
    it once (fixed point), and it never changes which host/registered
    domain a URL belongs to — the two invariants every dedup key and
    blocklist decision depend on."""
    from pyspark.sql import functions as F

    from graphique_spark.llm import web

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    once = web.normalize_url(F.col("url"))
    rows = df.select(
        "id",
        "url",
        once.alias("n1"),
        web.normalize_url(once).alias("n2"),
        web.url_host(F.col("url")).alias("h0"),
        web.url_host(once).alias("h1"),
    ).collect()
    for r in rows:
        assert r["n1"] == r["n2"], (r["url"], r["n1"], r["n2"])
        assert r["h0"] == r["h1"], (r["url"], r["h0"], r["h1"])
