"""URL operators for web-crawl training-data pipelines.

A crawl-scale corpus carries one URL per document, and the standard
curation moves — domain-level mixing, domain blocklists, per-host crawl
budgets, URL-level dedup — all start from the same two primitives:
parse the URL into components and canonicalize it (two URLs that differ
only by tracking params / default port / fragment are the same page).

Everything here is built-in column expressions over ONE shared regex —
JVM-side, whole-stage codegen, map-only; at 100 TB these run at
parquet-scan speed, and the canonical form is what the exact-dedup hash
and the domain groupBy key off. The grammar regex deliberately uses
only RE2-compatible syntax (no lookarounds, no backrefs) so DuckDB
oracles can run the IDENTICAL pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.psl_snapshot import (
    EXCEPTION_HOSTS_2,
    EXCEPTION_HOSTS_3,
    SUFFIXES_2,
    SUFFIXES_3,
    SUFFIXES_4,
    SUFFIXES_5,
    WILDCARD_PARENTS_1,
    WILDCARD_PARENTS_2,
    WILDCARD_PARENTS_3,
    WILDCARD_PARENTS_4,
)

# Cache of JVM Seq handles for the big PSL literal tuples, keyed by the
# tuple ITSELF (hashable; the dict entry also keeps it alive — an id()
# key could be silently reused by a new tuple after GC and return the
# wrong IN-set). The JVM (and py4j gateway) is per-process in classic
# mode, so a handle stays valid for the process lifetime.
_JSEQ_CACHE: dict[tuple, object] = {}


def _isin_bulk(col: Column, values: tuple) -> Column:
    """``col.isin(*values)`` without per-element py4j round trips.

    ``Column.isin`` builds one ``lit()`` Column per value — one py4j
    call each, ~3.6 s for the full PSL's 5771-entry suffix table, and
    the ladder holds TEN such tables referenced on every
    ``registered_domain`` construction. Scala's ``Column.isin(Any*)``
    wraps raw values in Literals JVM-side, so shipping the whole tuple
    as ONE converted seq (cached per process) makes the first build
    ~0.5 s and every later build a single py4j call. Same expression
    either way — the optimizer still folds it to an InSet hash probe.
    Falls back to the plain ``isin`` on Spark Connect (no ``_jc``),
    where literal conversion is client-side and cheap."""
    try:
        from pyspark.sql.classic.column import Column as _ClassicColumn, _to_seq
    except ImportError:  # pragma: no cover - Connect-only distribution
        return col.isin(*values)
    if not isinstance(col, _ClassicColumn):  # pragma: no cover - Connect
        return col.isin(*values)
    from pyspark import SparkContext

    seq = _JSEQ_CACHE.get(values)
    if seq is None:
        sc = SparkContext._active_spark_context
        seq = _to_seq(sc, list(values))
        _JSEQ_CACHE[values] = seq
    return _ClassicColumn(col._jc.isin(seq))


# scheme://host[:port][path][?query][#fragment] — capture groups:
#   1 scheme   2 host(:port)   3 path   4 query   5 fragment
URL_REGEX = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

DEFAULT_PORTS = {"http": "80", "https": "443"}

# query params stripped during canonicalization: the cross-site tracking
# family — never content-addressing. utm_* matches by prefix; the rest
# by exact param NAME (a bare prefix match would eat legitimate params
# like "reference=" or "refresh=")
TRACKING_PREFIXES = ("utm_",)
TRACKING_NAMES = ("fbclid", "gclid", "ref")


def _bound(col: Column, fn) -> Column:
    """Evaluate ``col`` exactly ONCE per row and hand the result to
    ``fn`` as a bound lambda variable (single-element ``transform``) —
    the antidote to the multi-reference re-evaluation trap: a Column
    expression referenced k times is inlined and EVALUATED k times, and
    when stages chain (canonicalize(resolve(canonicalize(url)))) the
    duplication compounds multiplicatively. ``registered_domain``
    pioneered the trick for its PSL ladder; ``extract_link_edges``
    binds its resolved-target tree the same way (r10 — the unbound
    link-edge chain produced a 780 KB physical plan whose per-row
    evaluation was the whole cost of the link_graph_edges bench line).
    Use it ONLY when the input is an expensive tree referenced many
    times: the single-element ``transform`` is interpreted, not
    codegen'd, and binding a plain column was measured at 2-2.5x pure
    overhead (url_domain_stats, r10). NULL flows through unchanged:
    ``array(col)`` is a one-element array holding the NULL, and the
    lambda sees it exactly as the unbound expression would."""
    return F.try_element_at(F.transform(F.array(col), fn), F.lit(1))


def url_part(col: Column, group: int) -> Column:
    """One captured component of the URL grammar (see URL_REGEX groups);
    empty string when the component is absent or the URL is malformed."""
    return F.regexp_extract(col, URL_REGEX, group)


def _host_port(col: Column) -> Column:
    # authority = [userinfo@]host[:port]; userinfo is stripped everywhere
    # downstream — it never addresses a different page, it leaks
    # credentials into logs/state, and it would corrupt the domain grain
    # (registered_domain('user:pass@ex.org') is garbage). RFC 3986
    # delimits userinfo at the LAST @ in the authority (userinfo itself
    # may contain @), so the strip is greedy: 'a@b@ex.org' → 'ex.org',
    # not 'b@ex.org' — a non-greedy strip would corrupt the host grain
    # AND dodge the robots-rules host join (deny-by-exception admits
    # what it cannot match).
    return F.regexp_replace(F.lower(url_part(col, 2)), "^.*@", "")


def url_host(col: Column) -> Column:
    """Lowercased host with any :port suffix removed."""
    return F.regexp_replace(_host_port(col), r":[0-9]+$", "")


def url_port(col: Column) -> Column:
    """Explicit port, or the scheme default (http 80 / https 443), or
    empty for unknown schemes with no explicit port."""
    explicit = F.regexp_extract(_host_port(col), r":([0-9]+)$", 1)
    scheme = F.lower(url_part(col, 1))
    default = F.lit("")
    for sch, port in DEFAULT_PORTS.items():
        default = F.when(scheme == sch, port).otherwise(default)
    return F.when(explicit != "", explicit).otherwise(default)


def registered_domain(host: Column) -> Column:
    """eTLD+1 of the host, backed by the vendored public-suffix
    snapshot (operators/psl_snapshot.py): if the host's last three
    labels form a known 3-label public suffix the registered domain is
    the last FOUR labels; if the last two form a known 2-label suffix
    (``co.uk``, ``github.io``, …) it is the last THREE; otherwise the
    last-two-labels default applies. So ``a.example.co.uk`` and
    ``b.example.co.uk`` resolve to one domain (``example.co.uk``)
    while ``a.example.org`` / ``b.example.org`` keep resolving to
    ``example.org``.

    Wildcard rules and their ``!``-exceptions (the part of the PSL
    grammar a plain suffix list cannot express) are modeled as two more
    ladders with PSL precedence — exception beats wildcard beats
    explicit suffix, longest match first: ``!city.kawasaki.jp`` makes
    ``city.kawasaki.jp`` registrable (and anything below it registers
    under it), ``*.kawasaki.jp`` makes every OTHER direct child a
    public suffix (so ``a.b.kawasaki.jp`` registers as the last four
    labels), ``*.ck``/``!www.ck`` likewise one level up, and
    ``*.compute.amazonaws.com`` one level down.

    The suffix sets compile to literal ``IN``-set predicates —
    JVM-side, codegen'd, no join, no shuffle; refresh the snapshot
    from the full PSL, splitting plain lines by label count into
    ``SUFFIXES_<n>``, ``*.``-lines into ``WILDCARD_PARENTS_<n>`` and
    ``!``-lines into ``EXCEPTION_HOSTS_<n>``. A host that IS exactly a
    public suffix (explicit or wildcard-child) has no registrable part
    and passes through unchanged, as do single-label hosts.

    Evaluation-cost note: the ladder references the label array ~15
    times, and ``host`` is usually an expression tree of regexes
    (``url_host``). Referencing that tree 15x per row re-evaluates it
    15x (the repo's documented multi-reference trap — it cost a
    measured 3x on the link-graph bench line). The split therefore
    binds ONCE as a lambda variable via a single-element
    ``transform``: every reference inside the ladder is a bound
    variable, and ``host`` itself is referenced exactly once (the
    pass-through branches rebuild it as ``array_join(parts, '.')``,
    which is byte-identical for any split input)."""
    return F.try_element_at(
        F.transform(F.array(F.split(host, r"\.")), _registered_domain_of_parts),
        F.lit(1),
    )


def _registered_domain_of_parts(parts: Column) -> Column:
    """The PSL ladder over an already-bound label array — see
    :func:`registered_domain` (callers with a staged ``split`` column
    may also use this directly)."""
    n = F.size(parts)
    host = F.array_join(parts, ".")
    # try_element_at: NULL (not an ANSI error) when the label is absent,
    # so the isin conditions below are safely false on short hosts
    last1 = F.try_element_at(parts, F.lit(-1))
    last2 = F.concat(F.try_element_at(parts, F.lit(-2)), F.lit("."), last1)
    last3 = F.concat(F.try_element_at(parts, F.lit(-3)), F.lit("."), last2)
    last4 = F.concat(F.try_element_at(parts, F.lit(-4)), F.lit("."), last3)
    last5 = F.concat(F.try_element_at(parts, F.lit(-5)), F.lit("."), last4)
    last6 = F.concat(F.try_element_at(parts, F.lit(-6)), F.lit("."), last5)
    return (
        # exceptions first: the carved-out host is itself registrable
        F.when((n >= 3) & _isin_bulk(last3, EXCEPTION_HOSTS_3), last3)
        .when((n >= 2) & _isin_bulk(last2, EXCEPTION_HOSTS_2), last2)
        # wildcards next: children of the parent are public suffixes,
        # so registration sits one label deeper than the parent's grain
        .when((n >= 6) & _isin_bulk(last4, WILDCARD_PARENTS_4), last6)
        .when((n >= 5) & _isin_bulk(last3, WILDCARD_PARENTS_3), last5)
        .when((n >= 4) & _isin_bulk(last2, WILDCARD_PARENTS_2), last4)
        # a host that IS a wildcard child (exactly parent+1 labels) is a
        # public suffix itself — no registrable part, pass through
        # (the *_1 analogue falls out below: bar.ck hits the n>=2
        # default = itself; the full PSL lists wildcard parents that
        # have NO plain-rule twin, so the deeper grains need explicit
        # pass-through branches)
        .when((n == 5) & _isin_bulk(last4, WILDCARD_PARENTS_4), host)
        .when((n == 4) & _isin_bulk(last3, WILDCARD_PARENTS_3), host)
        .when((n == 3) & _isin_bulk(last2, WILDCARD_PARENTS_2), host)
        .when((n >= 3) & _isin_bulk(last1, WILDCARD_PARENTS_1), last3)
        # explicit multi-label suffixes, longest first; a host that IS
        # exactly one of them has no registrable part and passes
        # through (the n == len(suffix) branches — without them the
        # ladder would fall to the default and return a too-short
        # grain, e.g. s3.amazonaws.com -> amazonaws.com)
        .when((n >= 6) & _isin_bulk(last5, SUFFIXES_5), last6)
        .when((n == 5) & _isin_bulk(last5, SUFFIXES_5), host)
        .when((n >= 5) & _isin_bulk(last4, SUFFIXES_4), last5)
        .when((n == 4) & _isin_bulk(last4, SUFFIXES_4), host)
        .when((n >= 4) & _isin_bulk(last3, SUFFIXES_3), last4)
        .when((n == 3) & _isin_bulk(last3, SUFFIXES_3), host)
        .when((n >= 3) & _isin_bulk(last2, SUFFIXES_2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def clean_query(col: Column) -> Column:
    """Query string with tracking params removed and the rest kept in
    original order (reordering would merge URLs whose servers are
    order-sensitive)."""
    params = F.filter(
        F.split(url_part(col, 4), "&"),
        lambda p: (p != "")
        & ~_is_tracking(p),
    )
    return F.array_join(params, "&")


def _is_tracking(param: Column) -> Column:
    name = F.substring_index(param, "=", 1)
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | name.startswith(pref)
    for exact in TRACKING_NAMES:
        cond = cond | (name == exact)
    return cond


def canonical_url(col: Column) -> Column:
    """Canonical form for URL-level dedup and domain stats: lowercase
    scheme + host, default port dropped (explicit non-default ports
    kept), empty path folded to "/", tracking params stripped, fragment
    dropped. Malformed URLs (no grammar match) canonicalize to NULL so
    callers can route them to quarantine instead of silently grouping
    them under ''.

    The input expression is referenced ~8 times by the component
    regexes below. That is fine for a plain column (an attribute
    reference is free), so this entry point stays UNBOUND — wrapping it
    in the ``_bound`` lambda indirection was measured (r10) to cost
    2-2.5x on the plain-column consumers (``url_domain_stats`` exec
    0.74 s → 1.86 s): a single-element ``transform`` is interpreted,
    not codegen'd. Callers whose input is itself an expensive
    expression tree (the resolved-target when-chain in
    :func:`extract_link_edges`) must bind it FIRST —
    ``_bound(tree, canonical_url)`` — or the tree is inlined and
    re-evaluated once per reference."""
    scheme = F.lower(url_part(col, 1))
    host = url_host(col)
    explicit_port = F.regexp_extract(_host_port(col), r":([0-9]+)$", 1)
    is_default = F.lit(False)
    for sch, port in DEFAULT_PORTS.items():
        is_default = is_default | ((scheme == sch) & (explicit_port == port))
    port_part = F.when(
        (explicit_port != "") & ~is_default, F.concat(F.lit(":"), explicit_port)
    ).otherwise(F.lit(""))
    path = url_part(col, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = clean_query(col)
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, q_part))


def url_components(df: DataFrame, url_col: str) -> DataFrame:
    """Attach parsed + canonical URL columns: scheme, host, port,
    path, query (tracking-stripped), fragment, registered_domain,
    canonical_url. One regex evaluated per component over one scan —
    Catalyst collapses the shared subexpressions; nothing shuffles."""
    c = F.col(url_col)
    host = url_host(c)
    return df.select(
        "*",
        F.lower(url_part(c, 1)).alias("url_scheme"),
        host.alias("url_host"),
        url_port(c).alias("url_port"),
        url_part(c, 3).alias("url_path"),
        clean_query(c).alias("url_query"),
        url_part(c, 5).alias("url_fragment"),
        registered_domain(host).alias("url_domain"),
        canonical_url(c).alias("url_canonical"),
    )


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain rollup: page count, distinct canonical
    URLs (URL-level dedup grain), distinct hosts — the relation domain
    blocklists, crawl budgets, and domain-mix resampling key off. One
    partial-aggregated shuffle on the domain key; at crawl scale the
    output is domains-sized (millions), not pages-sized (billions)."""
    parts = url_components(df, url_col)
    return (
        parts.groupBy(F.col("url_domain").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.count_distinct("url_canonical").alias("n_unique_urls"),
            F.count_distinct("url_host").alias("n_hosts"),
        )
    )


def html_links(html: Column) -> Column:
    """href targets of a raw HTML column, in document order. ONE
    regexp_extract_all over the (potentially large) HTML string —
    case-insensitive, so legacy HREF=/Href= markup still yields edges —
    extracts the whole `href=...` attribute; the quoted value is then
    peeled per element, a per-token regex over tiny strings whose cost
    is negligible next to the document scan. Double- and single-quoted
    forms both match. Map-only, codegen'd; the crawl primitive the
    link-graph tier (degree stats, PageRank) starts from.
    RE2-compatible so DuckDB oracles can run the identical patterns."""
    attrs = F.regexp_extract_all(
        html,
        F.lit("(?i)href\\s*=\\s*(?:\"[^\"]*\"|'[^']*')"),
        F.lit(0),
    )
    return F.filter(
        # leftmost quote .. rightmost quote = the value, either style
        F.transform(attrs, lambda a: F.regexp_extract(a, "[\"'](.*)[\"']", 1)),
        lambda x: x != "",
    )


def extract_link_edges(
    df: DataFrame,
    url_col: str,
    html_col: str,
    domain_grain: bool = True,
) -> DataFrame:
    """(src, dst) link edges from a crawl relation: harvest hrefs,
    resolve protocol-relative (//host/...) and root-relative (/path)
    targets against the source page, canonicalize both ends, and emit
    either domain-grain edges (default — the grain PageRank-as-
    authority-prior runs at; self-domain links drop) or page-grain
    canonical-URL edges (``domain_grain=False``; self-links drop).
    Fragment-only, query-only, and unresolvable relative targets drop.

    One explode per page (bounded by per-page link count), then pure
    column work — no joins, no Python; dedup is the consumer's choice
    (``pagerank`` distincts its input)."""
    src_canon = canonical_url(F.col(url_col))
    src_scheme = F.lower(url_part(F.col(url_col), 1))
    exploded = df.select(
        src_canon.alias("_src"),
        src_scheme.alias("_scheme"),
        F.explode(html_links(F.col(html_col))).alias("_raw"),
    ).filter(F.col("_src").isNotNull())
    # the canonical authority (scheme://host[:non-default-port]) comes
    # off the ALREADY-canonical source — resolving /path against a
    # port-stripped host would point a page on :8080 at a different
    # (default-port) page the crawl never saw
    authority = F.regexp_extract(
        F.col("_src"), r"^([a-z][a-z0-9+.-]*://[^/]+)", 1
    )
    # resolve: absolute stays; //host/... takes the source scheme;
    # /path takes the source authority; anything else (relative path,
    # #frag, mailto:, javascript:) is dropped — curation-grade link
    # graphs want site-to-site endorsements, not intra-page anchors
    resolved = F.when(
        F.col("_raw").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), F.col("_raw")
    ).when(
        F.col("_raw").startswith("//"),
        F.concat(F.col("_scheme"), F.lit(":"), F.col("_raw")),
    ).when(
        F.col("_raw").startswith("/"),
        F.concat(authority, F.col("_raw")),
    )
    # resolved is a sizeable when-chain; canonical_url references its
    # input ~8 times, and the isNotNull filter pushdown would copy the
    # inlined result again — so bind resolved ONCE (r10: exec 6.1 s →
    # 3.3 s on the link-graph bench line; the plan shrinks ~8x)
    edges = exploded.select(
        "_src", _bound(resolved, canonical_url).alias("_dst")
    ).filter(F.col("_dst").isNotNull())
    if domain_grain:
        edges = edges.select(
            registered_domain(url_host(F.col("_src"))).alias("src"),
            registered_domain(url_host(F.col("_dst"))).alias("dst"),
        )
    else:
        edges = edges.select(
            F.col("_src").alias("src"), F.col("_dst").alias("dst")
        )
    return edges.filter(F.col("src") != F.col("dst"))


def html_anchor_texts(html: Column) -> Column:
    """(href, anchor) pairs from raw HTML, in document order —
    ``array<struct<href, anchor>>``. Anchor text is what the LINKING
    page calls the target: the classic relevance signal for retrieval
    corpora and link-label datasets (anchor → target is a free
    query→document pair). Same cost shape as ``html_links``: ONE
    case-insensitive regexp pass extracts whole ``<a …href…>…</a>``
    elements from the large HTML string; href and inner text are then
    peeled per element (tiny strings), inner tags stripped, whitespace
    collapsed. Elements with an empty href drop; empty anchors (image
    links) survive with anchor='' — the caller decides whether a bare
    image link is signal."""
    matches = F.regexp_extract_all(
        html, F.lit("(?is)<a\\s[^>]*href[^>]*>.*?</a>"), F.lit(0)
    )
    pairs = F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, "(?i)href\\s*=\\s*[\"']([^\"']*)", 1).alias(
                "href"
            ),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract(m, "(?is)^<a[^>]*>(.*)</a>$", 1),
                        "<[^>]+>",
                        " ",
                    ),
                    "\\s+",
                    " ",
                )
            ).alias("anchor"),
        ),
    )
    return F.filter(pairs, lambda p: p["href"] != "")


def sitemap_entries(xml: Column) -> Column:
    """(loc, lastmod) entries of a sitemap.xml document, in document
    order — ``array<struct<loc, lastmod>>``. The other frontier seed:
    sitemaps enumerate what a site WANTS crawled (vs links = what other
    pages endorse). Same single-pass shape as the href harvest: one
    case-insensitive regexp pass extracts whole ``<url>…</url>``
    elements; loc/lastmod peel per element (tiny strings). lastmod is
    '' when absent — callers ``try_cast`` to date/timestamp, keeping
    malformed values diagnosable instead of silently null. Sitemap
    INDEX files (``<sitemap>`` elements) use the same two tags, so the
    second pattern harvests nested sitemap locations too."""
    urls_arr = F.regexp_extract_all(
        xml, F.lit("(?is)<url>.*?</url>"), F.lit(0)
    )
    return F.transform(
        urls_arr,
        lambda u: F.struct(
            F.trim(
                F.regexp_extract(u, "(?is)<loc>(.*?)</loc>", 1)
            ).alias("loc"),
            F.trim(
                F.regexp_extract(u, "(?is)<lastmod>(.*?)</lastmod>", 1)
            ).alias("lastmod"),
        ),
    )


def sitemap_index_locs(xml: Column) -> Column:
    """Nested sitemap locations of a sitemap INDEX file —
    ``array<string>`` of the <sitemap><loc> targets a crawler must
    fetch next to finish enumerating the site."""
    maps = F.regexp_extract_all(
        xml, F.lit("(?is)<sitemap>.*?</sitemap>"), F.lit(0)
    )
    return F.filter(
        F.transform(
            maps,
            lambda m: F.trim(F.regexp_extract(m, "(?is)<loc>(.*?)</loc>", 1)),
        ),
        lambda x: x != "",
    )
