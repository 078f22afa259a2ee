"""URL / domain operators for web-crawl curation: host and
registered-domain extraction, URL normalization (tracking-parameter
strip), domain-suffix blocklist filtering, and URL-level dedup.

C4, CCNet and RefinedWeb all gate documents on their source URL before
any text heuristic runs — blocklist the domain, collapse the URL to a
canonical form, drop re-crawls of the same page. Everything here is
built-in-function expressions (regexp / array HOFs) so the hot path
stays JVM-side and each operator has an exact ANSI-SQL mirror for the
DuckDB oracle.

Scale notes (100 TB crawl):
- blocklists come in two sizes. A config-sized list (≤ a few thousand
  entries) becomes a literal array and the filter is map-only
  (``arrays_overlap`` on the bounded suffix-candidate array — no join,
  no shuffle). A UT1-sized list (millions of domains) is a DataFrame:
  explode the ≤``max_labels`` suffix candidates per row and broadcast
  semi/anti-join against the list — the only shuffle-free join shape
  that implements *suffix* blocking without a LIKE cross-join.
- URL dedup is an exact-dedup groupBy on the normalized URL (map-side
  combine), never a window over a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multi-label public suffixes the mini registered-domain logic knows;
#: real deployments swap in the full Mozilla public-suffix list (it is
#: config-sized: ~9k rows, still a literal/broadcast).
PUBLIC_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "or.jp", "com.au",
    "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in", "co.kr",
    "com.tw", "com.sg",
)

#: query parameters that never identify content (tracking/session noise)
TRACKING_PARAMS = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)="

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/:?#]+:([0-9]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored before the first '#': a '?' inside the fragment is NOT a query
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme; '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased hostname (userinfo and port stripped); '' if absent."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_port(url: Column) -> Column:
    """Explicit port as a string ('8443'); '' when absent."""
    return F.regexp_extract(url, _PORT_RE, 1)


def url_path(url: Column) -> Column:
    """Path component ('' for bare-host URLs); query/fragment excluded."""
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    """Raw query string without the leading '?'; '' if absent."""
    return F.regexp_extract(url, _QUERY_RE, 1)


def registered_domain(
    host: Column, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> Column:
    """Registrable domain of a hostname: the last two labels, or the last
    three when the last two form a known multi-label public suffix
    (``www.bbc.co.uk`` -> ``bbc.co.uk``). Hosts with a single label
    (``localhost``) pass through unchanged. Pure array expressions —
    map-only, codegen-friendly."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*suffixes), last3).otherwise(last2)
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL for exact dedup: scheme and host lower-cased,
    fragment dropped, tracking query parameters (TRACKING_PARAMS)
    removed, surviving parameters sorted. Non-default ports are kept
    (':8080' names a different origin); the scheme-default ports :80/:443
    are dropped; userinfo is dropped (credentials must not key dedup).
    Path case is preserved (paths are case-sensitive on most servers).
    Non-URL values (no parseable host) pass through unchanged — otherwise
    every malformed row would collapse to the same garbage key and
    url_dedup would silently merge them. All array HOFs — no UDF."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(params), "&")
    host = url_host(url)
    scheme = url_scheme(url)
    port = url_port(url)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.when(host == "", url).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(
                (port != "") & ~default_port, F.concat(F.lit(":"), port)
            ).otherwise(F.lit("")),
            url_path(url),
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def host_suffix_candidates(host: Column, max_labels: int = 8) -> Column:
    """Every domain suffix of ``host`` with >= 2 labels, plus the host
    itself — the keys a suffix blocklist can match
    (``cdn.assets.spam.com`` -> [itself, assets.spam.com, spam.com]).
    Bounded at ``max_labels`` candidates so adversarial 100-label hosts
    can't blow up the row; a capped deep host keeps its *shortest*
    suffixes (the registrable tail blocklists actually list) and drops
    the longest ones, including the full host itself — exact-host
    entries deeper than ``max_labels``+1 labels stop matching."""
    def _suffixes(labels: Column) -> Column:
        n = F.size(labels)
        first = F.greatest(n - F.lit(max_labels), F.lit(1))
        return F.when(n <= 1, F.array(F.lower(host))).otherwise(
            F.transform(
                F.sequence(first, n - 1),
                lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
            )
        )

    # bind_once: a captured `labels` would re-run the host split per suffix
    from graphique_spark.llm.dedup import bind_once

    return bind_once(F.split(F.lower(host), r"\."), _suffixes)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked: list[str] | DataFrame,
    keep: bool = False,
    max_labels: int = 8,
    id_col: str | None = None,
) -> DataFrame:
    """Drop (or with ``keep=True``, retain only) rows whose URL host is a
    blocked domain or any subdomain of one.

    ``blocked`` as a Python list (config-sized, e.g. a policy file):
    map-only ``arrays_overlap`` against a literal array — zero joins.
    ``blocked`` as a single-column DataFrame (UT1-scale, millions of
    rows; requires ``id_col``, a unique row key): explode the bounded
    suffix-candidate array and broadcast semi/anti-join on the matched
    ids — suffix matching without a LIKE cross-join.
    """
    cands = host_suffix_candidates(url_host(F.col(url_col)), max_labels)
    if isinstance(blocked, DataFrame):
        if id_col is None:
            raise ValueError(
                "a DataFrame blocklist needs id_col (unique row key) to "
                "join the matched rows back"
            )
        [bcol] = blocked.columns
        block = blocked.select(F.lower(F.col(bcol)).alias("__blocked_domain"))
        matched_ids = (
            df.select(F.col(id_col), F.explode(cands).alias("__cand"))
            .join(F.broadcast(block), F.col("__cand") == F.col("__blocked_domain"), "inner")
            .select(id_col)
        )
        how = "left_semi" if keep else "left_anti"
        return df.join(matched_ids, on=id_col, how=how)
    # coalesce: a NULL url yields NULL candidates and arrays_overlap
    # returns NULL, which `~hit` would drop — NULL urls are not blocked
    # (matching the DataFrame-blocklist path, where explode emits nothing)
    hit = F.coalesce(
        F.arrays_overlap(cands, F.array(*[F.lit(b.lower()) for b in blocked])),
        F.lit(False),
    )
    return df.where(hit if keep else ~hit)


def url_dedup(
    df: DataFrame, url_col: str, id_col: str, keep_min: bool = True
) -> DataFrame:
    """Keep one row per *normalized* URL (the survivor with the min — or
    max — ``id_col``). Rows with a NULL url are all kept: they carry no
    URL evidence of being the same page, and grouping them would collapse
    every NULL into one survivor. Exact-dedup shape: groupBy on the
    normalized URL with a map-side-combinable min/max, then a semi-join
    on the unique survivor id; no global window."""
    agg = F.min(id_col) if keep_min else F.max(id_col)
    with_url = df.where(F.col(url_col).isNotNull())
    survivors = (
        with_url.select(normalize_url(F.col(url_col)).alias("__norm"), id_col)
        .groupBy("__norm")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return with_url.join(survivors, on=id_col, how="left_semi").unionByName(
        df.where(F.col(url_col).isNull())
    )


#: the HTML-to-text strip chain, in order: drop invisible blocks, then
#: comments, then turn block-level tags into newlines, drop remaining
#: tags, decode the common entities (AFTER tag stripping — decoding
#: first would fabricate tags out of escaped text), collapse whitespace.
#: Shared by the Spark expression and the DuckDB oracle rendering so the
#: two can never drift. Every pattern is RE2-compatible (no backrefs).
HTML_STRIP_CHAIN = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript>", " "),
    (r"(?s)<!--.*?-->", " "),
    # truncated pages (the crawl norm, not the exception): an UNTERMINATED
    # script/style/comment would otherwise lose only its opening tag to
    # the generic rule and leak raw JS/CSS into the "visible text"
    (r"(?is)<(?:script|style|noscript)\b[^>]*>.*$", " "),
    (r"(?s)<!--.*$", " "),
    (
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|nav"
        r"|header|footer|title|blockquote|pre)\b[^>]*>",
        "\n",
    ),
    # a real tag starts with a letter (optionally /-closed) or '!'
    # (doctype): a naked '< ' in prose ("a < b and b > a") is NOT a tag
    (r"</?[a-zA-Z][^>]*>|<![^>]*>", " "),
    # entities: &amp; decodes LAST so double-escaped text ("&amp;lt;",
    # an author showing '&lt;' literally) yields "&lt;", not "<"
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    # \r folds into the space run (CRLF is the norm in crawled HTML)
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
)


def html_text(html: Column) -> Column:
    """Visible text of an HTML document: script/style/noscript/comment
    content dropped, block-level tags become line breaks, remaining tags
    stripped, common entities decoded, whitespace collapsed. A regexp
    chain of built-ins — map-only, codegen-friendly, linear in input
    bytes; the trafilatura-class DOM heuristics stay out of the hot path
    (this is the 100 TB first-pass extractor, not a layout engine)."""
    out = html
    for pattern, repl in HTML_STRIP_CHAIN:
        out = F.regexp_replace(out, pattern, repl)
    return F.btrim(out, F.lit(" \n"))


def html_text_sql(expr: str) -> str:
    """The DuckDB rendering of :func:`html_text` over SQL expression
    ``expr`` — generated from the same HTML_STRIP_CHAIN so the oracle and
    the engine apply byte-identical patterns (RE2 needs the explicit 'g'
    flag where Java replaces globally by default)."""
    out = expr
    for pattern, repl in HTML_STRIP_CHAIN:
        pat_sql = pattern.replace("'", "''")
        repl_sql = repl.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{pat_sql}', '{repl_sql}', 'g')"
    return f"trim({out}, ' ' || chr(10))"
