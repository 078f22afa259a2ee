"""URL / domain operators (llm.web): parsing, registered domains,
normalization, suffix blocklists, URL dedup."""

import pytest
from pyspark.sql import functions as F

from graphique_spark.llm import web


def _one(spark, url, col):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(col(F.col("url")).alias("v")).first()["v"]


def test_url_parts(spark):
    url = "HTTPS://User:pw@WWW.Example.CO.UK:8443/Docs/A?b=2&a=1#frag"
    assert _one(spark, url, web.url_scheme) == "https"
    assert _one(spark, url, web.url_host) == "www.example.co.uk"
    assert _one(spark, url, web.url_path) == "/Docs/A"
    assert _one(spark, url, web.url_query) == "b=2&a=1"


def test_url_parts_absent_components(spark):
    assert _one(spark, "https://example.com", web.url_path) == ""
    assert _one(spark, "https://example.com/x", web.url_query) == ""
    assert _one(spark, "not a url", web.url_host) == ""


@pytest.mark.parametrize(
    ("host", "expected"),
    [
        ("www.bbc.co.uk", "bbc.co.uk"),
        ("a.b.news.example.com", "example.com"),
        ("example.com", "example.com"),
        ("co.uk", "co.uk"),  # bare public suffix: nothing to registrable
        ("localhost", "localhost"),
    ],
)
def test_registered_domain(spark, host, expected):
    df = spark.createDataFrame([(host,)], "h string")
    got = df.select(web.registered_domain(F.col("h")).alias("v")).first()["v"]
    assert got == expected


def test_normalize_url_strips_tracking_and_sorts(spark):
    a = "HTTPS://Example.com/p?utm_source=x&b=2&a=1&fbclid=zz#frag"
    b = "https://example.com/p?a=1&b=2"
    assert _one(spark, a, web.normalize_url) == b
    # already-canonical input is a fixed point
    assert _one(spark, b, web.normalize_url) == b


def test_normalize_url_empty_query_drops_question_mark(spark):
    assert (
        _one(spark, "https://e.com/p?utm_source=x", web.normalize_url)
        == "https://e.com/p"
    )


def test_host_suffix_candidates_bounded(spark):
    deep = ".".join(f"l{i}" for i in range(20)) + ".spam.com"
    df = spark.createDataFrame([(deep,)], "h string")
    cands = df.select(
        web.host_suffix_candidates(F.col("h"), max_labels=8).alias("c")
    ).first()["c"]
    assert len(cands) == 8  # capped
    assert "spam.com" in cands  # registrable tail always present
    assert deep not in cands  # longest suffixes kept, full host dropped


def test_domain_blocklist_filter_list(spark):
    rows = [
        (1, "https://ok.example.com/x"),
        (2, "https://spam.bad.net/y"),
        (3, "https://cdn.assets.spam.bad.net/z"),
        (4, "https://bad.net.example.org/w"),  # NOT a suffix match of bad.net
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = web.domain_blocklist_filter(df, "url", ["bad.net"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 4]
    only = web.domain_blocklist_filter(df, "url", ["bad.net"], keep=True)
    assert sorted(r["id"] for r in only.collect()) == [2, 3]


def test_domain_blocklist_filter_dataframe(spark):
    rows = [
        (1, "https://ok.example.com/x"),
        (2, "https://spam.bad.net/y"),
        (3, "https://a.b.spam.bad.net/z"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    block = spark.createDataFrame([("BAD.net",), ("other.org",)], "domain string")
    kept = web.domain_blocklist_filter(df, "url", block, id_col="id")
    assert sorted(r["id"] for r in kept.collect()) == [1]
    with pytest.raises(ValueError, match="id_col"):
        web.domain_blocklist_filter(df, "url", block)


def test_url_dedup_keeps_min_id_per_normalized_url(spark):
    rows = [
        (5, "https://e.com/p?a=1&utm_source=x"),
        (2, "HTTPS://E.com/p?a=1#frag"),
        (9, "https://e.com/other"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = web.url_dedup(df, "url", "id")
    assert sorted(r["id"] for r in out.collect()) == [2, 9]
    out_max = web.url_dedup(df, "url", "id", keep_min=False)
    assert sorted(r["id"] for r in out_max.collect()) == [5, 9]


def test_normalize_url_passes_non_urls_through(spark):
    rows = [(1, "not a url"), (2, "also: not one"), (3, "https://e.com/p")]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", web.normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    assert out[1] == "not a url"  # unchanged, NOT collapsed to '://'
    assert out[2] == "also: not one"
    assert out[3] == "https://e.com/p"
    # so dedup keeps distinct malformed rows distinct
    assert web.url_dedup(df, "url", "id").count() == 3


def test_query_not_parsed_from_fragment(spark):
    # '?' inside the fragment is fragment content, not a query string
    url = "https://e.com/p#sec?a=1"
    assert _one(spark, url, web.url_query) == ""
    assert _one(spark, url, web.normalize_url) == "https://e.com/p"


def test_normalize_url_ports(spark):
    # non-default port names a different origin: preserved
    assert (
        _one(spark, "https://h.com:8080/x", web.normalize_url)
        == "https://h.com:8080/x"
    )
    # scheme-default ports are noise: dropped
    assert _one(spark, "https://h.com:443/x", web.normalize_url) == "https://h.com/x"
    assert _one(spark, "http://h.com:80/x", web.normalize_url) == "http://h.com/x"
    # userinfo is dropped
    assert _one(spark, "https://u:p@h.com/x", web.normalize_url) == "https://h.com/x"
    assert _one(spark, "https://h.com:8443/", web.url_port) == "8443"
    assert _one(spark, "https://h.com/", web.url_port) == ""


def test_null_urls_survive_dedup_and_blocklist(spark):
    rows = [(1, None), (2, None), (3, "https://e.com/p"), (4, "https://e.com/p#f")]
    df = spark.createDataFrame(rows, "id long, url string")
    # both NULL rows kept (no URL evidence they are the same page);
    # 3/4 are the same page -> one survivor
    assert sorted(r["id"] for r in web.url_dedup(df, "url", "id").collect()) == [1, 2, 3]
    # NULL urls are not blocked — literal-list and DataFrame paths agree
    kept = web.domain_blocklist_filter(df, "url", ["e.com"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 2]
    block = spark.createDataFrame([("e.com",)], "domain string")
    kept2 = web.domain_blocklist_filter(df, "url", block, id_col="id")
    assert sorted(r["id"] for r in kept2.collect()) == [1, 2]


def test_html_text_strips_invisible_and_decodes(spark):
    html = (
        '<html><head><title>T</title><style>p{c}</style>'
        '<script>var x="<p>fake</p>";</script></head>'
        "<body><!-- c --><h1>A&amp;B</h1><p>one</p><div>two&nbsp;3</div>"
        "<ul><li>x</li></ul></body></html>"
    )
    got = _one(spark, html, web.html_text)
    assert got == "T\nA&B\none\ntwo 3\nx"
    # script/style/comment content must be gone entirely
    assert "fake" not in got and "c }" not in got


def test_html_text_plain_text_unharmed(spark):
    assert _one(spark, "no markup at all", web.html_text) == "no markup at all"
    assert _one(spark, "a < b and b > a", web.html_text) == "a < b and b > a"


def test_html_text_sql_renders_identically(spark):
    import duckdb

    from pyspark.sql import functions as F

    samples = [
        "<p>He&#39;s &quot;q&quot;</p>",
        "<SCRIPT a=b>x</script>tail",
        "<div><br/>nested <span>inline</span></div>",
        "plain",
        "<table><tr><td>c1</td></tr></table>",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "h string")
    got = [
        r["t"]
        for r in df.select(web.html_text(F.col("h")).alias("t")).collect()
    ]
    con = duckdb.connect()
    try:
        want = [
            con.execute(
                "SELECT " + web.html_text_sql("'" + s.replace("'", "''") + "'")
            ).fetchone()[0]
            for s in samples
        ]
    finally:
        con.close()
    assert got == want


def test_html_text_double_escaped_entities(spark):
    # '&amp;lt;' is an author DISPLAYING '&lt;' — decoding &amp; last
    # yields the visible '&lt;', never a second decode to '<'
    assert _one(spark, "a &amp;lt; b", web.html_text) == "a &lt; b"
    assert _one(spark, "x &amp;nbsp; y", web.html_text) == "x &nbsp; y"
    assert _one(spark, "q &amp; r", web.html_text) == "q & r"


def test_html_text_crlf_and_truncated_blocks(spark):
    # CRLF input: \r never reaches the output
    got = _one(spark, "line1<p>a</p>\r\nnext", web.html_text)
    assert "\r" not in got and got == "line1\na\nnext"
    # page truncated mid-script/mid-comment: contents must NOT leak
    assert _one(spark, "before<script>var x=1; evil();", web.html_text) == "before"
    assert _one(spark, "seen<style>p{display:none}", web.html_text) == "seen"
    assert _one(spark, "kept<!-- cut off", web.html_text) == "kept"
