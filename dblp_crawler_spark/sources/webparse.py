"""Fetch-side parsing for a general web crawl: robots.txt,
sitemap.xml, and HTML-to-text extraction — all pure JVM expression
chains with adjacent DuckDB fragments where an entry oracle replays
them.

The reference needs none of these (it crawls one well-behaved API
host and parses XML, dblp_crawler/downloader.py); a web-scale
frontier fetches arbitrary hosts, so the scheduler's politeness
inputs (`schemas.ROBOTS`: host, disallow_prefixes, crawl_delay_ms)
have to come FROM fetched robots.txt bytes, seed URLs come from
sitemaps, and the payload pipeline starts with boilerplate-stripped
text. Scale shape: everything here is a per-row projection or a
per-host window over that host's robots lines (a few hundred rows
per host at worst) — no global state, no Python on the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---- robots.txt ------------------------------------------------------------
#
# Group semantics per the robots exclusion spec (RFC 9309 §2.1):
# consecutive User-agent lines form ONE group sharing the rules that
# follow; a User-agent line after a non-UA line starts a NEW group.
# We honor the wildcard agent '*': a group applies iff any of its UA
# lines is '*'. Directives before any UA line are ignored. Where the
# (malformed) file has several '*' groups we take the union of their
# Disallow prefixes and the max Crawl-delay — a safe superset.

_UA_RE = r"(?i)^user-agent\s*:\s*(.*\S)\s*$"
_DIS_RE = r"(?i)^disallow\s*:\s*(\S+)\s*$"
_DELAY_RE = r"(?i)^crawl-delay\s*:\s*([0-9]+)\s*$"


def parse_robots(
    pages: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → the scheduler's ROBOTS shape
    (host, disallow_prefixes sorted, crawl_delay_ms) — one row per
    host that has an applicable wildcard group.

    Plugs directly into `scheduler.robots_status` and the crawl
    config's delay budgets; comments (#…) and blank lines ignored.
    """
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    ua = F.nullif(F.regexp_extract("line", _UA_RE, 1), F.lit(""))
    tagged = lines.select("host", "pos", "line", ua.alias("ua"))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = tagged.select(
        "host",
        "pos",
        "line",
        "ua",
        F.sum(
            (
                F.col("ua").isNotNull()
                & ~F.coalesce(F.lag(F.col("ua").isNotNull()).over(w), F.lit(False))
            ).cast("int")
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    ).filter(F.col("grp") > 0)
    per_group = grouped.groupBy("host", "grp").agg(
        F.max((F.col("ua") == "*").cast("int")).alias("star"),
        F.sort_array(
            F.collect_list(F.nullif(F.regexp_extract("line", _DIS_RE, 1), F.lit("")))
        ).alias("dis"),
        F.max(F.nullif(F.regexp_extract("line", _DELAY_RE, 1), F.lit("")).cast("int")).alias(
            "delay_s"
        ),
    )
    return (
        per_group.filter(F.col("star") == 1)
        .groupBy("host")
        .agg(
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("dis")))).alias(
                "disallow_prefixes"
            ),
            (F.max("delay_s") * 1000).cast("int").alias("crawl_delay_ms"),
        )
    )


def parse_robots_sql(src: str = "robots_pages") -> str:
    """DuckDB replay of :func:`parse_robots` over a relation
    ``src(host, robots_txt)`` — same windows, same group rule."""
    return f"""
        WITH lines AS (
          SELECT host, CAST(pos AS BIGINT) AS pos,
                 trim(regexp_replace(raw, '#.*$', '')) AS line
          FROM (
            SELECT host, unnest(string_split(robots_txt, chr(10))) AS raw,
                   generate_subscripts(string_split(robots_txt, chr(10)), 1) AS pos
            FROM {src}
          )
        ), tagged AS (
          SELECT host, pos, line,
                 nullif(regexp_extract(line, '(?i)^user-agent\\s*:\\s*(.*\\S)\\s*$', 1), '') AS ua
          FROM lines
        ), bnd AS (
          -- DuckDB forbids nested window calls: lag first, sum next
          SELECT host, pos, line, ua,
                 CASE WHEN ua IS NOT NULL AND NOT
                      coalesce(lag(ua IS NOT NULL) OVER (PARTITION BY host ORDER BY pos), FALSE)
                 THEN 1 ELSE 0 END AS b
          FROM tagged
        ), grouped AS (
          SELECT host, pos, line, ua,
                 SUM(b) OVER (PARTITION BY host ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM bnd
        ), per_group AS (
          SELECT host, grp,
                 MAX(CASE WHEN ua = '*' THEN 1 ELSE 0 END) AS star,
                 list_sort(list_filter(list(
                   nullif(regexp_extract(line, '(?i)^disallow\\s*:\\s*(\\S+)\\s*$', 1), '')
                 ), x -> x IS NOT NULL)) AS dis,
                 MAX(CAST(nullif(regexp_extract(line, '(?i)^crawl-delay\\s*:\\s*([0-9]+)\\s*$', 1), '') AS INT)) AS delay_s
          FROM grouped WHERE grp > 0 GROUP BY host, grp
        )
        SELECT host,
               list_sort(list_distinct(flatten(list(dis)))) AS disallow_prefixes,
               CAST(MAX(delay_s) * 1000 AS INT) AS crawl_delay_ms
        FROM per_group WHERE star = 1 GROUP BY host
    """


# RFC 9309 §2.2.2 rule lines: Allow AND Disallow, raw pattern kept
# (wildcard '*' and end-anchor '$' are evaluated at decision time by
# scheduler.robots_decide, not here). An empty value ("Disallow:")
# matches nothing per the spec and is dropped by the \S+ requirement.
_RULE_RE = r"(?i)^(allow|disallow)\s*:\s*(\S+)\s*$"


def parse_robots_rules(
    pages: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, rule, pattern): every Allow /
    Disallow line of the applicable wildcard ('*') groups, with the
    raw pattern preserved — the input `scheduler.robots_decide`
    needs for longest-match precedence, which `parse_robots`'s
    prefix-only Disallow list cannot express (no Allow overrides, no
    '*' / '$' wildcards). Same RFC 9309 group semantics as
    parse_robots: stacked User-agent lines form one group, orphan
    directives before any UA line are ignored, multiple '*' groups
    union their rules.
    """
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    ua = F.nullif(F.regexp_extract("line", _UA_RE, 1), F.lit(""))
    tagged = lines.select("host", "pos", "line", ua.alias("ua"))
    w = Window.partitionBy("host").orderBy("pos")
    grouped = tagged.select(
        "host",
        "pos",
        "line",
        "ua",
        F.sum(
            (
                F.col("ua").isNotNull()
                & ~F.coalesce(F.lag(F.col("ua").isNotNull()).over(w), F.lit(False))
            ).cast("int")
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    ).filter(F.col("grp") > 0)
    star = F.max((F.col("ua") == "*").cast("int")).over(
        Window.partitionBy("host", "grp")
    )
    rtype = F.nullif(F.lower(F.regexp_extract("line", _RULE_RE, 1)), F.lit(""))
    pat = F.nullif(F.regexp_extract("line", _RULE_RE, 2), F.lit(""))
    return (
        grouped.withColumn("star", star)
        .filter(F.col("star") == 1)
        .select("host", rtype.alias("rule"), pat.alias("pattern"))
        .filter(F.col("rule").isNotNull() & F.col("pattern").isNotNull())
        .distinct()
    )


def parse_robots_rules_sql(src: str = "robots_pages") -> str:
    """DuckDB replay of :func:`parse_robots_rules` over a relation
    ``src(host, robots_txt)`` — same group windows, same rule regex."""
    return f"""
        WITH rr_lines AS (
          SELECT host, CAST(pos AS BIGINT) AS pos,
                 trim(regexp_replace(raw, '#.*$', '')) AS line
          FROM (
            SELECT host, unnest(string_split(robots_txt, chr(10))) AS raw,
                   generate_subscripts(string_split(robots_txt, chr(10)), 1) AS pos
            FROM {src}
          )
        ), rr_tagged AS (
          SELECT host, pos, line,
                 nullif(regexp_extract(line, '(?i)^user-agent\\s*:\\s*(.*\\S)\\s*$', 1), '') AS ua
          FROM rr_lines
        ), rr_bnd AS (
          SELECT host, pos, line, ua,
                 CASE WHEN ua IS NOT NULL AND NOT
                      coalesce(lag(ua IS NOT NULL) OVER (PARTITION BY host ORDER BY pos), FALSE)
                 THEN 1 ELSE 0 END AS b
          FROM rr_tagged
        ), rr_grouped AS (
          SELECT host, pos, line, ua,
                 SUM(b) OVER (PARTITION BY host ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM rr_bnd
        ), rr_star AS (
          SELECT host, line, grp,
                 MAX(CASE WHEN ua = '*' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host, grp) AS star
          FROM rr_grouped WHERE grp > 0
        )
        SELECT DISTINCT host,
               lower(regexp_extract(line, '(?i)^(allow|disallow)\\s*:\\s*(\\S+)\\s*$', 1)) AS rule,
               regexp_extract(line, '(?i)^(allow|disallow)\\s*:\\s*(\\S+)\\s*$', 2) AS pattern
        FROM rr_star
        WHERE star = 1
          AND nullif(lower(regexp_extract(line, '(?i)^(allow|disallow)\\s*:\\s*(\\S+)\\s*$', 1)), '') IS NOT NULL
          AND nullif(regexp_extract(line, '(?i)^(allow|disallow)\\s*:\\s*(\\S+)\\s*$', 2), '') IS NOT NULL
    """


# ---- sitemap.xml -----------------------------------------------------------
def sitemap_urls(pages: DataFrame, xml_col: str = "sitemap_xml", keep: list | None = None) -> DataFrame:
    """Extract <loc> URLs from sitemap / sitemap-index XML and emit
    them canonicalized — the bulk frontier-seeding path (the web
    analog of the reference's venue-index pages). One row per loc."""
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    locs = F.regexp_extract_all(F.col(xml_col), F.lit(r"<loc>([^<]*)</loc>"), 1)
    return pages.select(
        *cols, F.explode(locs).alias("raw_loc")
    ).select(*cols, canonical_url("raw_loc").alias("url"))


#: one <url>…</url> record of a urlset sitemap ((?s): records span lines)
_SM_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_SM_LOC_RE = r"<loc>([^<]*)</loc>"
_SM_LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"


def sitemap_entries(pages: DataFrame, xml_col: str = "sitemap_xml",
                    keep: list | None = None) -> DataFrame:
    """Sitemap <url> records → (url canonicalized, lastmod DATE|NULL).

    The lastmod-aware sibling of :func:`sitemap_urls`: recrawl
    scheduling (operators/recrawl.py) and discovery anti-joins need
    the per-URL modification date the protocol carries, so records
    are parsed as paired fields — blocks first (one regexp_extract_all
    per page), then per-block loc/lastmod extracts. Records without a
    <loc> are dropped; a missing/empty <lastmod> is NULL (the spec
    makes it optional). Pure expression chain, one explode; the
    DuckDB replay is :func:`sitemap_entries_sql`.
    """
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK_RE), 1)
    return (
        pages.select(*cols, F.explode(blocks).alias("blk"))
        .withColumn("raw_loc", F.regexp_extract("blk", _SM_LOC_RE, 1))
        .filter(F.col("raw_loc") != "")
        .select(
            *cols,
            canonical_url("raw_loc").alias("url"),
            F.to_date(
                F.nullif(F.regexp_extract("blk", _SM_LASTMOD_RE, 1), F.lit(""))
            ).alias("lastmod"),
        )
    )


def sitemap_entries_sql(src: str = "sitemap_pages", keep: str = "host") -> str:
    """DuckDB replay of :func:`sitemap_entries` over ``src`` (must
    expose `keep` + sitemap_xml): same block regexps, same
    canonicalization (canonical_url_sql), same NULL-lastmod rule."""
    from ..functions.urlnorm import canonical_url_sql

    return f"""
        SELECT {keep}, {canonical_url_sql('raw_loc')} AS url,
               CAST(nullif(regexp_extract(blk, '{_SM_LASTMOD_RE}', 1), '') AS DATE) AS lastmod
        FROM (
          SELECT {keep}, blk, regexp_extract(blk, '{_SM_LOC_RE}', 1) AS raw_loc
          FROM (
            SELECT {keep},
                   unnest(regexp_extract_all(sitemap_xml, '{_SM_BLOCK_RE}', 1)) AS blk
            FROM {src}
          )
        ) WHERE raw_loc <> ''
    """


#: one <sitemap>…</sitemap> record of a sitemapindex (nested tier)
_SM_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"


def sitemap_index_urls(pages: DataFrame, xml_col: str = "sitemap_xml",
                       keep: list | None = None) -> DataFrame:
    """Child-sitemap URLs from sitemapindex XML — the nested tier of
    real-world discovery (large sites shard their urlsets behind one
    index; the 50k-URL protocol cap forces it). One row per child
    <sitemap><loc>, canonicalized; join the result against the
    fetched page store and feed the bodies back through
    :func:`sitemap_entries` for the full two-level expansion (the
    driver entry does exactly that round trip)."""
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_INDEX_BLOCK_RE), 1)
    return (
        pages.select(*cols, F.explode(blocks).alias("blk"))
        .withColumn("raw_loc", F.regexp_extract("blk", _SM_LOC_RE, 1))
        .filter(F.col("raw_loc") != "")
        .select(*cols, canonical_url("raw_loc").alias("sitemap_url"))
    )


def sitemap_index_urls_sql(src: str = "index_pages", keep: str = "host") -> str:
    """DuckDB replay of :func:`sitemap_index_urls` over ``src``."""
    from ..functions.urlnorm import canonical_url_sql

    return f"""
        SELECT {keep}, {canonical_url_sql('raw_loc')} AS sitemap_url
        FROM (
          SELECT {keep}, regexp_extract(blk, '{_SM_LOC_RE}', 1) AS raw_loc
          FROM (
            SELECT {keep},
                   unnest(regexp_extract_all(sitemap_xml, '{_SM_INDEX_BLOCK_RE}', 1)) AS blk
            FROM {src}
          )
        ) WHERE raw_loc <> ''
    """


# ---- WARC records ----------------------------------------------------------
#
# Text-mode WARC/1.0 record parsing: the interchange format every
# web-scale crawl reads and writes (ISO 28500; Common Crawl's storage
# format). A segment is a concatenation of records
#
#   WARC/1.0\r\n<headers>\r\n\r\n<payload>\r\n\r\n
#
# and we recover (uri, type, declared length, actual payload) per
# record with a split on the version line + per-record header
# extracts — no lookahead (the DuckDB replay is RE2) and no Python.
# Caveat, stated rather than hidden: REAL WARC payloads are binary
# and length-delimited — a payload containing the record separator
# byte-sequence needs offset-based reads (the bucketed-store /
# content_sniff binary path), not regex. This text-mode parser is
# for the (common) text-payload extraction tier, and it reports the
# declared-vs-actual length mismatch as a `truncated` audit flag
# instead of trusting either side.

_WARC_SEP_RE = r"WARC/1\.0\r\n"
_WARC_URI_RE = r"WARC-Target-URI: ([^\r\n]*)"
_WARC_TYPE_RE = r"WARC-Type: ([^\r\n]*)"
_WARC_CL_RE = r"Content-Length: ([0-9]+)"
_WARC_BODY_RE = r"(?s)\r\n\r\n(.*)\r\n\r\n$"


def warc_records(segments: DataFrame, content_col: str = "warc",
                 keep: list | None = None) -> DataFrame:
    """Parse concatenated text-mode WARC/1.0 records out of a segment
    column → one row per record: (uri, rec_type, content_length,
    body, truncated). `body` is the payload CLIPPED to the declared
    Content-Length; `truncated` flags records whose actual payload is
    shorter than declared (torn writes — the audit a resumable
    fetcher runs before trusting a segment). Pure expression chain,
    one explode."""
    cols = keep if keep is not None else [c for c in segments.columns if c != content_col]
    recs = F.filter(
        F.split(F.col(content_col), _WARC_SEP_RE), lambda x: x != F.lit("")
    )
    # the regexp yields digits-or-empty, so the cast is ANSI-safe; a
    # record with no Content-Length header has NULL declared length —
    # nothing to clip, nothing to audit against (truncated = false)
    cl = F.nullif(F.regexp_extract("rec", _WARC_CL_RE, 1), F.lit("")).cast("long")
    payload = F.regexp_extract("rec", _WARC_BODY_RE, 1)
    return (
        segments.select(*cols, F.explode(recs).alias("rec"))
        .select(
            *cols,
            F.regexp_extract("rec", _WARC_URI_RE, 1).alias("uri"),
            F.regexp_extract("rec", _WARC_TYPE_RE, 1).alias("rec_type"),
            cl.alias("content_length"),
            payload.alias("__payload"),
        )
        .select(
            *cols,
            "uri",
            "rec_type",
            "content_length",
            F.when(F.col("content_length").isNull(), F.col("__payload"))
            .otherwise(
                F.col("__payload").substr(F.lit(1), F.col("content_length").cast("int"))
            )
            .alias("body"),
            F.coalesce(
                F.length("__payload") < F.col("content_length"), F.lit(False)
            ).alias("truncated"),
        )
    )


def warc_records_sql(src: str = "warc_segments", keep: str = "host") -> str:
    """DuckDB replay of :func:`warc_records` over ``src`` (must
    expose `keep` + warc): string_split_regex for the record split,
    same header/body regexps, substr clip + truncation flag."""
    return f"""
        SELECT {keep}, uri, rec_type, content_length,
               CASE WHEN content_length IS NULL THEN payload
                    ELSE substr(payload, 1, CAST(content_length AS INTEGER)) END AS body,
               COALESCE(length(payload) < content_length, false) AS truncated
        FROM (
          SELECT {keep},
                 regexp_extract(rec, '{_WARC_URI_RE}', 1) AS uri,
                 regexp_extract(rec, '{_WARC_TYPE_RE}', 1) AS rec_type,
                 CAST(nullif(regexp_extract(rec, '{_WARC_CL_RE}', 1), '') AS BIGINT)
                   AS content_length,
                 regexp_extract(rec, '{_WARC_BODY_RE}', 1) AS payload
          FROM (
            SELECT {keep}, unnest(list_filter(
                     string_split_regex(warc, '{_WARC_SEP_RE}'), x -> x <> '')) AS rec
            FROM {src}
          )
        )
    """


# ---- HTML → text -----------------------------------------------------------
# NOTE: no backreferences anywhere — the DuckDB side is RE2.
_HTML_STEPS = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so '&amp;lt;' decodes to the literal '&lt;'
]


def html_to_text(html) -> F.Column:
    """Boilerplate-stripped visible text of an HTML page: script/
    style/comments removed, tags dropped, common entities decoded,
    whitespace collapsed. The first step of any text-curation
    pipeline over crawled pages; pure regexp chain, codegen-fused."""
    x = F.col(html) if isinstance(html, str) else html
    for pat, rep in _HTML_STEPS:
        x = F.regexp_replace(x, pat, rep)
    for ent, ch in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """DuckDB fragment computing exactly ``html_to_text(expr)``
    (regexp_replace needs the 'g' flag there; Spark's is global)."""
    x = expr
    for pat, rep in _HTML_STEPS:
        p = pat.replace("'", "''")
        x = f"regexp_replace({x}, '{p}', '{rep}', 'g')"
    for ent, ch in _ENTITIES:
        c = ch.replace("'", "''")
        x = f"replace({x}, '{ent}', '{c}')"
    return f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


_SITEMAP_LINE_RE = r"(?i)^sitemap\s*:\s*(\S+)\s*$"


# ---- in-page crawl-control directives ---------------------------------------
#
# RE2-compatible on purpose (no backreferences / lookahead) so the
# DuckDB oracle replays the exact patterns: quotes matched with a
# ["'] class instead of a \1 backref, attribute order covered by one
# regex per order. Values stop at ["'>] — an unquoted attr value
# ends at '>' or whitespace anyway for the attrs we extract.
_META_ROBOTS_NF = (
    r"""(?i)<meta\s[^>]*name\s*=\s*["']?robots["']?[^>]*content\s*=\s*["']([^"'>]*)["']"""
)
_META_ROBOTS_CF = (
    r"""(?i)<meta\s[^>]*content\s*=\s*["']([^"'>]*)["'][^>]*name\s*=\s*["']?robots["']?"""
)
_LINK_CANON_RF = (
    r"""(?i)<link\s[^>]*rel\s*=\s*["']?canonical["']?[^>]*href\s*=\s*["']([^"'>]*)["']"""
)
_LINK_CANON_HF = (
    r"""(?i)<link\s[^>]*href\s*=\s*["']([^"'>]*)["'][^>]*rel\s*=\s*["']?canonical["']?"""
)


def html_meta_directives(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """Per-page crawl-control directives a polite indexer must honor
    BEFORE content or links are used: ``<meta name=robots>``'s
    noindex (drop the payload from the index) and nofollow (don't
    expand this page's links into the frontier), and
    ``<link rel=canonical>``'s self-declared duplicate-of URL — the
    page-side alias signal that complements content-fingerprint
    `alias_collapse` (the canonical target may not be fetched yet,
    so no fingerprint exists to group on).

    Both attribute orders and either quote style are matched;
    directive tokens are comma/space-delimited and case-insensitive
    per the robots-meta spec. The canonical href is emitted in
    canonical URL form so it joins the seen set / frontier keys
    directly. Pure projection — no shuffle, no UDF.

    Returns (url, noindex boolean, nofollow boolean,
    canonical string|NULL).
    """
    from ..functions.urlnorm import canonical_url

    content = F.coalesce(
        F.nullif(F.regexp_extract(html_col, _META_ROBOTS_NF, 1), F.lit("")),
        F.nullif(F.regexp_extract(html_col, _META_ROBOTS_CF, 1), F.lit("")),
    )
    tok = lambda t: F.coalesce(  # noqa: E731
        content.rlike(r"(?i)(^|[,\s])" + t + r"([,\s]|$)"), F.lit(False)
    )
    href = F.coalesce(
        F.nullif(F.regexp_extract(html_col, _LINK_CANON_RF, 1), F.lit("")),
        F.nullif(F.regexp_extract(html_col, _LINK_CANON_HF, 1), F.lit("")),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        (tok("noindex") | tok("none")).alias("noindex"),
        (tok("nofollow") | tok("none")).alias("nofollow"),
        canonical_url(href).alias("canonical"),
    )


def html_meta_directives_sql(src: str = "html_pages") -> str:
    """DuckDB replay of :func:`html_meta_directives` over
    ``src(url, html)`` — same RE2-safe patterns, same token tests,
    same canonicalization."""
    from ..functions.urlnorm import canonical_url_sql

    nf = _META_ROBOTS_NF.replace("'", "''")
    cf = _META_ROBOTS_CF.replace("'", "''")
    rf = _LINK_CANON_RF.replace("'", "''")
    hf = _LINK_CANON_HF.replace("'", "''")
    content = (
        f"coalesce(nullif(regexp_extract(html, '{nf}', 1), ''),"
        f" nullif(regexp_extract(html, '{cf}', 1), ''))"
    )

    def tok(t):
        return (
            f"coalesce(regexp_matches({content}, '(?i)(^|[,\\s]){t}([,\\s]|$)'), FALSE)"
        )

    href = (
        f"coalesce(nullif(regexp_extract(html, '{rf}', 1), ''),"
        f" nullif(regexp_extract(html, '{hf}', 1), ''))"
    )
    return f"""
        SELECT url,
               ({tok('noindex')} OR {tok('none')}) AS noindex,
               ({tok('nofollow')} OR {tok('none')}) AS nofollow,
               {canonical_url_sql(href)} AS canonical
        FROM {src}
    """


def robots_sitemaps(pages: DataFrame, host_col: str = "host",
                    text_col: str = "robots_txt") -> DataFrame:
    """`Sitemap:` declarations from robots.txt — the protocol's
    actual discovery linkage (RFC 9309 treats them as global lines,
    valid ANYWHERE in the file, outside any user-agent group): this
    is how a crawler learns where a host's sitemaps live without
    guessing /sitemap.xml. One row per declaration, canonicalized —
    feed the result to the sitemap fetch tier and from there into
    :func:`sitemap_entries` → ``fetch_plan``. Comments stripped like
    the group parser; pure expressions, one explode."""
    from ..functions.urlnorm import canonical_url

    lines = pages.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select(
        "host", F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line")
    )
    loc = F.regexp_extract("line", _SITEMAP_LINE_RE, 1)
    return (
        lines.withColumn("__loc", loc)
        .filter(F.col("__loc") != "")
        .select("host", canonical_url("__loc").alias("sitemap_url"))
    )


def robots_sitemaps_sql(src: str = "robots_pages") -> str:
    """DuckDB replay of :func:`robots_sitemaps` over ``src``."""
    from ..functions.urlnorm import canonical_url_sql

    return f"""
        SELECT host, {canonical_url_sql('loc')} AS sitemap_url
        FROM (
          SELECT host,
                 regexp_extract(trim(regexp_replace(raw, '#.*$', '')),
                                '{_SITEMAP_LINE_RE}', 1) AS loc
          FROM (
            SELECT host, unnest(string_split(robots_txt, chr(10))) AS raw
            FROM {src}
          )
        ) WHERE loc <> ''
    """


# ---- sitemap priority / changefreq (the scheduling hints) ---------------------

_SM_CHANGEFREQ_RE = r"<changefreq>([^<]*)</changefreq>"
_SM_PRIORITY_RE = r"<priority>([^<]*)</priority>"

#: spec changefreq values → nominal recrawl interval seconds ('always'
#: = 0, 'never' = none — the scheduler treats NULL as content-driven).
CHANGEFREQ_SECONDS = {
    "always": 0, "hourly": 3600, "daily": 86400, "weekly": 604800,
    "monthly": 2592000, "yearly": 31536000,
}


def sitemap_entries_full(pages: DataFrame, xml_col: str = "sitemap_xml",
                         keep: list | None = None) -> DataFrame:
    """Sitemap <url> records with the SCHEDULING hints:
    (url, lastmod, changefreq, priority, changefreq_s) — the
    publisher-declared recrawl priors that seed recrawl scheduling
    before any observed change history exists (the sitemaps.org
    protocol; priority defaults to 0.5 when absent, per spec).

    changefreq is validated against the spec enum (lowercased;
    anything else → NULL — publishers emit junk); priority is
    try-cast to double and range-clamped to [0,1] (out-of-range →
    NULL, then the 0.5 default); changefreq_s is the integer nominal
    interval from CHANGEFREQ_SECONDS ('never' → NULL: the scheduler
    falls back to observed change rates).  Same one-explode pure
    expression chain as sitemap_entries."""
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK_RE), 1)
    cf_raw = F.lower(F.nullif(F.regexp_extract("blk", _SM_CHANGEFREQ_RE, 1), F.lit("")))
    cf = F.when(cf_raw.isin(*CHANGEFREQ_SECONDS, "never"), cf_raw)
    pr_raw = F.nullif(
        F.regexp_extract("blk", _SM_PRIORITY_RE, 1), F.lit("")
    ).try_cast("double")
    pr = F.coalesce(
        F.when((pr_raw >= 0.0) & (pr_raw <= 1.0), pr_raw), F.lit(0.5)
    )
    cf_s = F.lit(None).cast("long")
    for name, secs in CHANGEFREQ_SECONDS.items():
        cf_s = F.when(cf == name, F.lit(secs).cast("long")).otherwise(cf_s)
    return (
        pages.select(*cols, F.explode(blocks).alias("blk"))
        .withColumn("raw_loc", F.regexp_extract("blk", _SM_LOC_RE, 1))
        .filter(F.col("raw_loc") != "")
        .select(
            *cols,
            canonical_url("raw_loc").alias("url"),
            F.to_date(
                F.nullif(F.regexp_extract("blk", _SM_LASTMOD_RE, 1), F.lit(""))
            ).alias("lastmod"),
            cf.alias("changefreq"),
            pr.alias("priority"),
            cf_s.alias("changefreq_s"),
        )
    )


def sitemap_entries_full_sql(src: str = "sitemap_pages",
                             keep: str = "host") -> str:
    """DuckDB replay of :func:`sitemap_entries_full` — same regexes,
    validation, clamp, default, and interval mapping."""
    from ..functions.urlnorm import canonical_url_sql

    enum = ", ".join(f"'{v}'" for v in list(CHANGEFREQ_SECONDS) + ["never"])
    cf_raw = f"lower(nullif(regexp_extract(blk, '{_SM_CHANGEFREQ_RE}', 1), ''))"
    cf = f"CASE WHEN {cf_raw} IN ({enum}) THEN {cf_raw} END"
    pr_raw = f"TRY_CAST(nullif(regexp_extract(blk, '{_SM_PRIORITY_RE}', 1), '') AS DOUBLE)"
    pr = (f"COALESCE(CASE WHEN {pr_raw} >= 0.0 AND {pr_raw} <= 1.0"
          f" THEN {pr_raw} END, 0.5)")
    cf_whens = " ".join(
        f"WHEN '{name}' THEN {secs}" for name, secs in CHANGEFREQ_SECONDS.items()
    )
    return f"""
        SELECT {keep}, {canonical_url_sql('raw_loc')} AS url,
               CAST(nullif(regexp_extract(blk, '{_SM_LASTMOD_RE}', 1), '') AS DATE) AS lastmod,
               {cf} AS changefreq,
               {pr} AS priority,
               CAST(CASE ({cf}) {cf_whens} ELSE NULL END AS BIGINT) AS changefreq_s
        FROM (
          SELECT {keep}, blk, regexp_extract(blk, '{_SM_LOC_RE}', 1) AS raw_loc
          FROM (
            SELECT {keep},
                   unnest(regexp_extract_all(sitemap_xml, '{_SM_BLOCK_RE}', 1)) AS blk
            FROM {src}
          )
        ) WHERE raw_loc <> ''
    """


def sitemap_coverage(declared: DataFrame, fetched: DataFrame,
                     host_col: str = "host", url_col: str = "url") -> DataFrame:
    """Per-host crawl-completeness audit: of the URLs a site DECLARES
    in its sitemaps, how many did the crawl actually fetch — and how
    much of the fetch went to URLs the site never declared. The two
    gaps mean different things operationally: low coverage_pct =
    the scheduler starves that host (budget/priority bug); high
    n_undeclared = the crawl burns budget on trap/duplicate URL
    space the site itself doesn't vouch for.

    Plan shape: both inputs deduped, one full-outer equi-join on
    (host, url) — co-partitioned hash join, no broadcast assumption
    since either side can be the big one — then a per-host
    conditional-count aggregate. coverage_pct rounds the only float.

    Output: (host, n_declared, n_fetched_declared, n_undeclared,
    coverage_pct).
    """
    d = declared.select(F.col(host_col).alias("host"),
                        F.col(url_col).alias("url")).distinct() \
                .withColumn("__d", F.lit(1))
    f = fetched.select(F.col(host_col).alias("host"),
                       F.col(url_col).alias("url")).distinct() \
               .withColumn("__f", F.lit(1))
    j = d.join(f, ["host", "url"], "full_outer")
    return (
        j.groupBy("host")
        .agg(
            F.sum(F.coalesce("__d", F.lit(0))).alias("n_declared"),
            F.sum(F.when(F.col("__d").isNotNull() & F.col("__f").isNotNull(), 1)
                  .otherwise(0)).alias("n_fetched_declared"),
            F.sum(F.when(F.col("__d").isNull(), 1).otherwise(0)).alias("n_undeclared"),
        )
        .select(
            "host",
            F.col("n_declared").cast("long").alias("n_declared"),
            F.col("n_fetched_declared").cast("long").alias("n_fetched_declared"),
            F.col("n_undeclared").cast("long").alias("n_undeclared"),
            F.when(F.col("n_declared") > 0,
                   F.round(F.col("n_fetched_declared") * 100.0 / F.col("n_declared"), 2))
             .alias("coverage_pct"),
        )
    )


def sitemap_coverage_sql(declared: str, fetched: str,
                         host_col: str = "host", url_col: str = "url") -> str:
    """DuckDB replay of :func:`sitemap_coverage` — same dedup, same
    full-outer join, same conditional counts."""
    return f"""
        WITH sc_d AS (
          SELECT DISTINCT {host_col} AS host, {url_col} AS url FROM {declared}
        ), sc_f AS (
          SELECT DISTINCT {host_col} AS host, {url_col} AS url FROM {fetched}
        ), sc_j AS (
          SELECT COALESCE(d.host, f.host) AS host,
                 d.url IS NOT NULL AS in_d, f.url IS NOT NULL AS in_f
          FROM sc_d d FULL OUTER JOIN sc_f f
            ON d.host = f.host AND d.url = f.url
        )
        SELECT host,
               CAST(SUM(CASE WHEN in_d THEN 1 ELSE 0 END) AS BIGINT) AS n_declared,
               CAST(SUM(CASE WHEN in_d AND in_f THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_fetched_declared,
               CAST(SUM(CASE WHEN NOT in_d THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_undeclared,
               CASE WHEN SUM(CASE WHEN in_d THEN 1 ELSE 0 END) > 0 THEN
                 ROUND(SUM(CASE WHEN in_d AND in_f THEN 1 ELSE 0 END) * 100.0
                       / SUM(CASE WHEN in_d THEN 1 ELSE 0 END), 2) END
                 AS coverage_pct
        FROM sc_j GROUP BY host
    """


# ---- HTML link + image extraction -------------------------------------------

# covers quoted AND bare attribute values; a quoted value stops at
# its quote (excluded from the class). Documented limitation: a
# quoted href containing literal whitespace truncates at the space —
# such URLs are invalid unencoded anyway.
_HREF_RE = r"""(?i)<a\s[^>]*?href\s*=\s*["']?([^"'\s>]+)"""
_IMG_TAG_RE = r"(?i)<img\s[^>]*>"
# attribute preceded by whitespace/quote so data-src/data-srcset
# never match, and srcset= never matches the src pattern
_SRC_RE = r"""(?i)[\s"']src\s*=\s*["']?([^"'\s>]+)"""
_SRCSET_DQ_RE = r"""(?i)[\s"']srcset\s*=\s*"([^"]*)\""""
_SRCSET_SQ_RE = r"""(?i)[\s"']srcset\s*=\s*'([^']*)'"""
_ALT_DQ_RE = r"""(?i)[\s"']alt\s*=\s*"([^"]*)\""""
_ALT_SQ_RE = r"""(?i)[\s"']alt\s*=\s*'([^']*)'"""


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """(page url, out_url) for every <a href> in the page, resolved
    against the page URL — the generic-HTML frontier expansion source
    (the reference expands through dblp's XML API only,
    `/root/reference/dblp_crawler/crawler.py`; a web-scale frontier
    grows from anchors). Non-fetchable schemes and fragment-only
    hrefs drop (resolve_url → NULL); duplicates collapse so the
    frontier sees each edge once. Pure regexp_extract_all + explode —
    map-side until the final distinct."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    hrefs = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), F.lit(1))
        ).alias("__href"),
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    out = hrefs.where(resolvable_href("__href")).select(
        "url", resolve_url("url", "__href").alias("out_url")
    )
    return out.distinct()


def extract_outlinks_sql(src: str, url_col: str = "url",
                         html_col: str = "html") -> str:
    """DuckDB replay of :func:`extract_outlinks`."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    esc = _HREF_RE.replace("'", "''")
    return f"""
        WITH ol_h AS (
          SELECT {url_col} AS url,
                 unnest(regexp_extract_all({html_col}, '{esc}', 1)) AS __href
          FROM {src}
        )
        SELECT DISTINCT url, out_url FROM (
          SELECT url, {resolve_url_sql('url', '__href')} AS out_url
          FROM ol_h WHERE {resolvable_href_sql('__href')}
        ) ol_r
    """


def extract_images(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """One row per <img> tag: (url, tag_idx, img_url, alt,
    width_hint) — the image+caption PAIR source of this graft cell
    (alt text is the caption a curation pipeline gates and aligns).

    srcset is honored: candidates split on ',', each parsed for its
    'Nw' width or 'Nx' density descriptor, and the WIDEST candidate
    wins (highest w, then highest x, then first listed — the
    largest-asset rule an image harvester wants); a tag with no
    srcset falls back to src. Candidate URLs resolve against the
    page URL; tags whose winner is unresolvable (data:, javascript:)
    drop. Shapes: regexp over the page (map-side), posexplode per
    candidate, ONE (url, tag_idx)-keyed window to pick the winner —
    no shuffle touches the page HTML itself, only the slim candidate
    rows."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_TAG_RE), F.lit(0))
        ).alias("tag_idx", "__tag"),
    )
    t = F.col("__tag")
    srcset = F.coalesce(
        F.nullif(F.regexp_extract(t, _SRCSET_DQ_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(t, _SRCSET_SQ_RE, 1), F.lit("")),
    )
    attrs = tags.withColumns(
        {
            "__src": F.nullif(F.regexp_extract(t, _SRC_RE, 1), F.lit("")),
            "__srcset": srcset,
            "alt": F.coalesce(
                F.nullif(F.regexp_extract(t, _ALT_DQ_RE, 1), F.lit("")),
                F.nullif(F.regexp_extract(t, _ALT_SQ_RE, 1), F.lit("")),
            ),
        }
    )
    cands = attrs.select(
        "url", "tag_idx", "alt",
        F.posexplode(
            F.when(F.col("__srcset").isNotNull(),
                   F.split(F.col("__srcset"), ","))
            .otherwise(F.array(F.coalesce(F.col("__src"), F.lit("")))),
        ).alias("pos", "__cand"),
    ).withColumn("__cand", F.trim(F.col("__cand")))
    c = F.col("__cand")
    parsed = cands.withColumns(
        {
            "__curl": F.regexp_extract(c, r"^(\S+)", 1),
            "__w": F.nullif(F.regexp_extract(c, r"\s(\d+)w$", 1),
                            F.lit("")).cast("long"),
            "__x": F.nullif(F.regexp_extract(c, r"\s(\d+(?:\.\d+)?)x$", 1),
                            F.lit("")).cast("double"),
        }
    )
    w = Window.partitionBy("url", "tag_idx").orderBy(
        F.desc_nulls_last("__w"), F.desc_nulls_last("__x"), F.asc("pos")
    )
    best = (
        parsed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    return best.where(resolvable_href(F.col("__curl"))).select(
        "url", "tag_idx",
        resolve_url("url", "__curl").alias("img_url"),
        "alt",
        F.col("__w").cast("int").alias("width_hint"),
    )


def extract_images_sql(src: str, url_col: str = "url",
                       html_col: str = "html") -> str:
    """DuckDB replay of :func:`extract_images` — same regexes, same
    widest-candidate window."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    def esc(p):
        return p.replace("'", "''")

    return f"""
        WITH ei_t AS (
          SELECT {url_col} AS url, CAST(t.tag_idx - 1 AS INT) AS tag_idx, t.tag
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0)) AS tag,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0), 1) AS tag_idx) t
        ), ei_a AS (
          SELECT url, tag_idx,
                 NULLIF(regexp_extract(tag, '{esc(_SRC_RE)}', 1), '') AS s,
                 COALESCE(
                   NULLIF(regexp_extract(tag, '{esc(_SRCSET_DQ_RE)}', 1), ''),
                   NULLIF(regexp_extract(tag, '{esc(_SRCSET_SQ_RE)}', 1), '')
                 ) AS ss,
                 COALESCE(
                   NULLIF(regexp_extract(tag, '{esc(_ALT_DQ_RE)}', 1), ''),
                   NULLIF(regexp_extract(tag, '{esc(_ALT_SQ_RE)}', 1), '')
                 ) AS alt
          FROM ei_t
        ), ei_c AS (
          SELECT url, tag_idx, alt, c.pos - 1 AS pos, trim(c.cand) AS cand
          FROM ei_a,
               LATERAL (SELECT unnest(CASE WHEN ss IS NOT NULL
                            THEN string_split(ss, ',')
                            ELSE [COALESCE(s, '')] END) AS cand,
                        generate_subscripts(CASE WHEN ss IS NOT NULL
                            THEN string_split(ss, ',')
                            ELSE [COALESCE(s, '')] END, 1) AS pos) c
        ), ei_p AS (
          SELECT url, tag_idx, alt, pos,
                 regexp_extract(cand, '^(\\S+)', 1) AS curl,
                 TRY_CAST(NULLIF(regexp_extract(cand, '\\s(\\d+)w$', 1), '')
                          AS BIGINT) AS w,
                 TRY_CAST(NULLIF(regexp_extract(cand,
                          '\\s(\\d+(?:\\.\\d+)?)x$', 1), '')
                          AS DOUBLE) AS x
          FROM ei_c
        ), ei_r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY url, tag_idx
                 ORDER BY w DESC NULLS LAST, x DESC NULLS LAST, pos) AS rn
          FROM ei_p
        )
        SELECT url, tag_idx,
               {resolve_url_sql('url', 'curl')} AS img_url, alt,
               CAST(w AS INT) AS width_hint
        FROM ei_r WHERE rn = 1 AND {resolvable_href_sql('curl')}
    """


_LINK_TAG_RE = r"(?i)<link\s[^>]*>"
_HREFLANG_RE = r"""(?i)[\s"']hreflang\s*=\s*["']?([^"'\s>]+)"""
_LINK_HREF_RE = r"""(?i)[\s"']href\s*=\s*["']?([^"'\s>]+)"""


def hreflang_alternates(pages: DataFrame, url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """(url, hreflang, alt_url) for every <link hreflang=...> —
    the publisher-declared translation graph. Multilingual curation
    keys on it twice: near-dedup must NOT collapse translations of
    one page (they are distinct corpus rows for different language
    pipelines), and the alternates of an admitted page are free
    high-precision frontier candidates for the other language
    pipelines. Attribute order free (hreflang before or after href),
    quoted or bare values, hreflang lowercased ('x-default' kept
    literal), hrefs resolved against the page URL, unresolvable
    targets dropped. Same map-side regexp + explode shape as the
    outlink extractor."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_RE), F.lit(0))
        ).alias("__tag"),
    )
    t = F.col("__tag")
    parsed = tags.select(
        "url",
        F.lower(F.nullif(F.regexp_extract(t, _HREFLANG_RE, 1),
                         F.lit(""))).alias("hreflang"),
        F.nullif(F.regexp_extract(t, _LINK_HREF_RE, 1), F.lit("")).alias("__href"),
    ).where(F.col("hreflang").isNotNull() & F.col("__href").isNotNull())
    out = parsed.select(
        "url", "hreflang", resolve_url("url", "__href").alias("alt_url")
    )
    return out.where(F.col("alt_url").isNotNull()).distinct()


def hreflang_alternates_sql(src: str, url_col: str = "url",
                            html_col: str = "html") -> str:
    """DuckDB replay of :func:`hreflang_alternates`."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    def esc(p):
        return p.replace("'", "''")

    return f"""
        WITH ha_t AS (
          SELECT {url_col} AS url,
                 unnest(regexp_extract_all({html_col},
                   '{esc(_LINK_TAG_RE)}', 0)) AS tag
          FROM {src}
        ), ha_p AS (
          SELECT url,
                 lower(NULLIF(regexp_extract(tag, '{esc(_HREFLANG_RE)}', 1),
                              '')) AS hreflang,
                 NULLIF(regexp_extract(tag, '{esc(_LINK_HREF_RE)}', 1), '')
                   AS __href
          FROM ha_t
        )
        SELECT DISTINCT url, hreflang, alt_url FROM (
          SELECT url, hreflang,
                 {resolve_url_sql('url', '__href')} AS alt_url
          FROM ha_p
          WHERE hreflang IS NOT NULL AND __href IS NOT NULL
        ) WHERE alt_url IS NOT NULL
    """


# ---- SVG structure + safety gate -----------------------------------------------
#
# SVG is the one web image format that is TEXT (XML) and can carry
# executable content — <script> elements, on* event handlers,
# javascript: hrefs, and <foreignObject> HTML islands are all XSS
# vectors a crawler must gate BEFORE re-serving or rasterizing a
# crawled icon/diagram.  Dimensions come from the root tag's
# width/height attributes (px or unitless only — CSS-unit lengths
# need layout context and stay NULL) and from viewBox.  Everything
# is regexp over the text: the root tag is located in a bounded
# prescan window (WHATWG meta-charset discipline — a real SVG's root
# element sits at the head), while the SECURITY scans run over the
# FULL text, because a <script> at byte 10^6 is still a script.

SVG_PRESCAN_CHARS = 4096
_SVG_TAG_RE = r"(?is)<svg(?:\s[^>]*)?>"
_SVG_W_RE = r"""(?is)\swidth\s*=\s*["']([^"']*)["']"""
_SVG_H_RE = r"""(?is)\sheight\s*=\s*["']([^"']*)["']"""
_SVG_VB_RE = r"""(?is)\sviewbox\s*=\s*["']([^"']*)["']"""
#: number in px or unitless — anything else (pt/em/%/cm) is a layout
#: question, not a pixel count
_SVG_PX_RE = r"^\s*([0-9]+(?:\.[0-9]+)?)\s*(?:px)?\s*$"
_SVG_VBWH_RE = (r"^\s*-?[0-9]+(?:\.[0-9]+)?[\s,]+-?[0-9]+(?:\.[0-9]+)?[\s,]+"
                r"(-?[0-9]+(?:\.[0-9]+)?)[\s,]+(-?[0-9]+(?:\.[0-9]+)?)\s*$")
_SVG_SCRIPT_RE = r"(?is)<script[\s>]"
_SVG_HANDLER_RE = r"""(?is)\son[a-z]+\s*=\s*["']"""
_SVG_FOREIGN_RE = r"(?is)<foreignobject[\s>]"
_SVG_JSHREF_RE = r"""(?is)[\s"'](?:xlink:)?href\s*=\s*["']\s*javascript:"""
_SVG_ANIM_RE = r"(?is)<(?:animate|animatetransform|animatemotion|set)[\s>]"


def svg_structure(pages: DataFrame, text_col: str = "svg_text") -> DataFrame:
    """Add (is_svg, width_px, height_px, vb_w, vb_h, has_script,
    has_event_handler, has_foreign_object, has_js_href, unsafe,
    is_animated) for SVG payload text.

    ``unsafe`` is the admission gate: any of the four executable-
    content signals.  Non-SVG rows (no <svg> root tag in the prescan
    window) get is_svg=false and all-NULL structure.  Dimension
    parsing is two-staged (raw attribute value, then a px-or-unitless
    number parse) so an absent attribute and a CSS-unit length both
    read NULL but stay distinguishable in the raw stage; stroke-width
    never matches the width pattern (the attribute name is preceded
    by whitespace, not '-').  Pure projection — one regexp pass per
    signal, no shuffle, and patterns are shared verbatim with the
    DuckDB replay (RE2-safe: no lookaround, inline (?is) flags)."""
    t = F.col(text_col)
    win = F.substring(t, 1, SVG_PRESCAN_CHARS)
    staged = pages.withColumns(
        {
            "__tag": F.nullif(F.regexp_extract(win, _SVG_TAG_RE, 0), F.lit("")),
        }
    )
    tag = F.col("__tag")
    is_svg = tag.isNotNull()
    staged = staged.withColumns(
        {
            "is_svg": is_svg,
            "__wraw": F.when(is_svg, F.nullif(
                F.regexp_extract(tag, _SVG_W_RE, 1), F.lit(""))),
            "__hraw": F.when(is_svg, F.nullif(
                F.regexp_extract(tag, _SVG_H_RE, 1), F.lit(""))),
            "__vbraw": F.when(is_svg, F.nullif(
                F.regexp_extract(tag, _SVG_VB_RE, 1), F.lit(""))),
        }
    )

    def px(raw):
        return F.nullif(
            F.regexp_extract(raw, _SVG_PX_RE, 1), F.lit("")).cast("double")

    flags = {
        "has_script": _SVG_SCRIPT_RE,
        "has_event_handler": _SVG_HANDLER_RE,
        "has_foreign_object": _SVG_FOREIGN_RE,
        "has_js_href": _SVG_JSHREF_RE,
        "is_animated": _SVG_ANIM_RE,
    }
    out = staged.withColumns(
        {
            "width_px": px(F.col("__wraw")),
            "height_px": px(F.col("__hraw")),
            "vb_w": F.nullif(F.regexp_extract(
                F.col("__vbraw"), _SVG_VBWH_RE, 1), F.lit("")).cast("double"),
            "vb_h": F.nullif(F.regexp_extract(
                F.col("__vbraw"), _SVG_VBWH_RE, 2), F.lit("")).cast("double"),
            **{name: F.when(F.col("is_svg"), t.rlike(pat))
               for name, pat in flags.items()},
        }
    )
    unsafe = (F.col("has_script") | F.col("has_event_handler")
              | F.col("has_foreign_object") | F.col("has_js_href"))
    return out.withColumn(
        "unsafe", F.when(F.col("is_svg"), unsafe)
    ).drop("__tag", "__wraw", "__hraw", "__vbraw")


def svg_structure_sql(src: str, keep: str = "doc_id",
                      text_col: str = "svg_text") -> str:
    """DuckDB replay of :func:`svg_structure` — same patterns (RE2
    both sides), same two-stage dimension parse."""
    def esc(p):
        return p.replace("'", "''")

    flag_sel = ", ".join(
        f"CASE WHEN tag IS NOT NULL THEN "
        f"regexp_matches({text_col}, '{esc(pat)}') END AS {name}"
        for name, pat in [
            ("has_script", _SVG_SCRIPT_RE),
            ("has_event_handler", _SVG_HANDLER_RE),
            ("has_foreign_object", _SVG_FOREIGN_RE),
            ("has_js_href", _SVG_JSHREF_RE),
            ("is_animated", _SVG_ANIM_RE),
        ]
    )
    return f"""
        WITH sv0 AS (
          SELECT {keep}, {text_col},
                 NULLIF(regexp_extract(
                   substring({text_col}, 1, {SVG_PRESCAN_CHARS}),
                   '{esc(_SVG_TAG_RE)}', 0), '') AS tag
          FROM {src}
        ), sv1 AS (
          SELECT {keep}, tag IS NOT NULL AS is_svg,
                 CASE WHEN tag IS NOT NULL THEN NULLIF(
                   regexp_extract(tag, '{esc(_SVG_W_RE)}', 1), '') END AS wraw,
                 CASE WHEN tag IS NOT NULL THEN NULLIF(
                   regexp_extract(tag, '{esc(_SVG_H_RE)}', 1), '') END AS hraw,
                 CASE WHEN tag IS NOT NULL THEN NULLIF(
                   regexp_extract(tag, '{esc(_SVG_VB_RE)}', 1), '') END AS vbraw,
                 {flag_sel}
          FROM sv0
        )
        SELECT {keep}, is_svg,
               TRY_CAST(NULLIF(regexp_extract(wraw, '{esc(_SVG_PX_RE)}', 1), '')
                        AS DOUBLE) AS width_px,
               TRY_CAST(NULLIF(regexp_extract(hraw, '{esc(_SVG_PX_RE)}', 1), '')
                        AS DOUBLE) AS height_px,
               TRY_CAST(NULLIF(regexp_extract(vbraw, '{esc(_SVG_VBWH_RE)}', 1), '')
                        AS DOUBLE) AS vb_w,
               TRY_CAST(NULLIF(regexp_extract(vbraw, '{esc(_SVG_VBWH_RE)}', 2), '')
                        AS DOUBLE) AS vb_h,
               has_script, has_event_handler, has_foreign_object, has_js_href,
               CASE WHEN is_svg THEN has_script OR has_event_handler
                    OR has_foreign_object OR has_js_href END AS unsafe,
               is_animated
        FROM sv1
    """


# ---- RSS / Atom feeds ---------------------------------------------------------
#
# Feeds are the PUSH discovery channel next to sitemaps' pull tier:
# news/blog hosts surface new URLs in RSS/Atom minutes after publish,
# with a per-entry date that seeds recrawl freshness exactly like
# sitemap lastmod — a crawler that only walks sitemaps discovers a
# news site's day on the next sitemap regeneration. Same plan shape
# as sitemap_entries: block regexps, ONE explode, pure expressions.
#
# Date handling: RSS carries RFC 1123 pubDate, Atom ISO 8601 updated.
# Both reduce to an ISO day string built from regex fields (month
# names folded through one table), then ONE try-parse to DATE on
# each engine — junk months, out-of-range days (Feb 31) and absent
# dates all NULL-absorb identically (a bad publisher can never fail
# a wave).

_RSS_ITEM_RE = r"(?s)<item[^>]*>(.*?)</item>"
_ATOM_ENTRY_RE = r"(?s)<entry[^>]*>(.*?)</entry>"
_RSS_LINK_RE = r"<link>([^<]*)</link>"
_ATOM_LINK_RE = r"<link[^>]*href=\"([^\"]*)\""
_RSS_DATE_RE = r"<pubDate>[^<]*?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{4})"
_ATOM_UPDATED_RE = r"<updated>(\d{4}-\d{2}-\d{2})"
_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec"]


def feed_entries(pages: DataFrame, xml_col: str = "feed_xml",
                 keep: list | None = None) -> DataFrame:
    """RSS <item> / Atom <entry> records → (kind, url canonicalized,
    published DATE|NULL).

    Records without a link are dropped (nothing to schedule); for
    Atom the FIRST <link href> wins (entries may carry alternate/self
    rels — first-match is the documented tie rule, same on both
    engines). Dates parse day-month-year only (scheduling is
    day-granular like sitemap lastmod); unparseable or impossible
    dates are NULL via the try-parse. One explode over the
    concatenated rss/atom block arrays; DuckDB replay is
    :func:`feed_entries_sql`."""
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    xml = F.col(xml_col)
    recs = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(_RSS_ITEM_RE), 1),
            lambda b: F.struct(F.lit("rss").alias("kind"), b.alias("blk")),
        ),
        F.transform(
            F.regexp_extract_all(xml, F.lit(_ATOM_ENTRY_RE), 1),
            lambda b: F.struct(F.lit("atom").alias("kind"), b.alias("blk")),
        ),
    )
    ex = pages.select(*cols, F.explode(recs).alias("rec")).select(
        *cols, F.col("rec.kind").alias("kind"), F.col("rec.blk").alias("blk")
    )
    raw_link = F.when(
        F.col("kind") == "rss", F.regexp_extract("blk", _RSS_LINK_RE, 1)
    ).otherwise(F.regexp_extract("blk", _ATOM_LINK_RE, 1))

    mon_name = F.lower(F.regexp_extract("blk", _RSS_DATE_RE, 2))
    mon = F.lit(None).cast("int")
    for i, m in enumerate(_MONTHS):
        mon = F.when(mon_name == m, i + 1).otherwise(mon)
    day = F.nullif(F.regexp_extract("blk", _RSS_DATE_RE, 1), F.lit(""))
    year = F.nullif(F.regexp_extract("blk", _RSS_DATE_RE, 3), F.lit(""))
    rss_iso = F.concat(
        year, F.lit("-"), F.lpad(mon.cast("string"), 2, "0"),
        F.lit("-"), F.lpad(day, 2, "0"),
    )
    atom_iso = F.nullif(F.regexp_extract("blk", _ATOM_UPDATED_RE, 1), F.lit(""))
    iso = F.when(F.col("kind") == "rss", rss_iso).otherwise(atom_iso)
    return (
        ex.withColumn("raw_link", raw_link)
        .filter(F.col("raw_link") != "")
        .select(
            *cols,
            "kind",
            canonical_url("raw_link").alias("url"),
            F.try_to_timestamp(iso, F.lit("yyyy-MM-dd")).cast("date")
            .alias("published"),
        )
    )


def feed_entries_sql(src: str = "feed_pages", keep: str = "host",
                     xml_col: str = "feed_xml") -> str:
    """DuckDB replay of :func:`feed_entries` over ``src`` (must expose
    `keep` + the feed XML): same block/field regexps (passed verbatim
    — DuckDB strings don't process backslashes), same month table,
    same one-try-parse date rule (try_strptime)."""
    from ..functions.urlnorm import canonical_url_sql

    mon_whens = " ".join(
        f"WHEN '{m}' THEN {i + 1}" for i, m in enumerate(_MONTHS)
    )
    # double quotes are literal inside a single-quoted SQL string —
    # the pattern passes verbatim
    atom_link = _ATOM_LINK_RE
    return f"""
        WITH fe_recs AS (
          SELECT {keep}, 'rss' AS kind,
                 unnest(regexp_extract_all({xml_col}, '{_RSS_ITEM_RE}', 1)) AS blk
          FROM {src}
          UNION ALL
          SELECT {keep}, 'atom' AS kind,
                 unnest(regexp_extract_all({xml_col}, '{_ATOM_ENTRY_RE}', 1)) AS blk
          FROM {src}
        ), fe_f AS (
          SELECT {keep}, kind, blk,
                 CASE WHEN kind = 'rss'
                      THEN regexp_extract(blk, '{_RSS_LINK_RE}', 1)
                      ELSE regexp_extract(blk, '{atom_link}', 1) END AS raw_link,
                 CASE WHEN kind = 'rss' THEN
                   CASE WHEN nullif(regexp_extract(blk, '{_RSS_DATE_RE}', 1), '') IS NULL
                          OR nullif(regexp_extract(blk, '{_RSS_DATE_RE}', 3), '') IS NULL
                          OR (CASE lower(regexp_extract(blk, '{_RSS_DATE_RE}', 2))
                              {mon_whens} ELSE NULL END) IS NULL
                        THEN NULL
                        ELSE concat(
                          regexp_extract(blk, '{_RSS_DATE_RE}', 3), '-',
                          lpad(CAST(CASE lower(regexp_extract(blk, '{_RSS_DATE_RE}', 2))
                               {mon_whens} ELSE NULL END AS VARCHAR), 2, '0'), '-',
                          lpad(regexp_extract(blk, '{_RSS_DATE_RE}', 1), 2, '0'))
                   END
                   ELSE nullif(regexp_extract(blk, '{_ATOM_UPDATED_RE}', 1), '')
                 END AS iso
          FROM fe_recs
        )
        SELECT {keep}, kind, {canonical_url_sql('raw_link')} AS url,
               CAST(try_strptime(iso, '%Y-%m-%d') AS DATE) AS published
        FROM fe_f
        WHERE raw_link <> ''
    """


# ---- X-Robots-Tag response-header directives -------------------------------------
#
# The header-level twin of <meta name=robots> — and for an IMAGE
# crawl the only twin that exists: a JPEG has no <meta> tag, so the
# only way a server can declare noindex/noimageindex for a binary
# payload is the X-Robots-Tag response header. Directives are
# comma-separated tokens; a line may be scoped to one crawler by a
# leading 'ua:' token (the ONLY directive that itself takes a colon
# argument is unavailable_after, which is recognized and kept
# unscoped). Multiple X-Robots-Tag headers accumulate.

_XRT_LINE_RE = r"(?im)^x-robots-tag[ \t]*:[ \t]*([^\r\n]+)"
_XRT_SCOPE_RE = r"(?i)^([a-zA-Z0-9_.*-]+)[ \t]*:"
_XRT_STRIP_RE = r"(?i)^[a-zA-Z0-9_.*-]+[ \t]*:[ \t]*"


def x_robots_tag(pages: DataFrame, url_col: str = "url",
                 headers_col: str = "headers",
                 ua: str = "spark-frontier") -> DataFrame:
    """Per-URL crawl-control flags from X-Robots-Tag response
    headers: (url, noindex, nofollow, noimageindex, noarchive).

    A line scoped to a DIFFERENT user agent is ignored; a line scoped
    to ``ua`` applies with the scope token stripped; unscoped lines
    always apply ('none' implies noindex+nofollow per the public
    robots-meta spec). Pure projection — regexp_extract_all over the
    raw header block, higher-order filter/transform for the scoping,
    one lowercased join, token tests. No shuffle, no UDF."""
    cols = x_robots_tag_cols(headers_col, ua=ua)
    return pages.select(
        F.col(url_col).alias("url"),
        cols["noindex"].alias("noindex"),
        cols["nofollow"].alias("nofollow"),
        cols["noimageindex"].alias("noimageindex"),
        cols["noarchive"].alias("noarchive"),
    )


def x_robots_tag_cols(headers_col: str = "headers",
                      ua: str = "spark-frontier") -> dict:
    """The x_robots_tag output expressions as a name → Column dict —
    shared with the composed header_policy operator."""

    def scope(v):
        return F.lower(F.regexp_extract(v, _XRT_SCOPE_RE, 1))

    lines = F.regexp_extract_all(F.col(headers_col), F.lit(_XRT_LINE_RE), 1)
    ua_l = ua.lower()
    applicable = F.filter(
        lines,
        lambda v: (scope(v) == "") | (scope(v) == "unavailable_after")
        | (scope(v) == ua_l),
    )
    stripped = F.transform(
        applicable,
        lambda v: F.when(
            scope(v) == ua_l, F.regexp_replace(v, _XRT_STRIP_RE, "")
        ).otherwise(v),
    )
    joined = F.lower(F.array_join(stripped, ","))
    tok = lambda t: F.coalesce(  # noqa: E731
        joined.rlike(r"(^|[,\s])" + t + r"([,\s]|$)"), F.lit(False)
    )
    return {
        "noindex": tok("noindex") | tok("none"),
        "nofollow": tok("nofollow") | tok("none"),
        "noimageindex": tok("noimageindex"),
        "noarchive": tok("noarchive"),
    }


def x_robots_tag_sql(src: str = "header_pages", url_col: str = "url",
                     headers_col: str = "headers",
                     ua: str = "spark-frontier") -> str:
    """DuckDB replay of :func:`x_robots_tag` — same patterns (passed
    verbatim), same scoping filter/strip, same token tests."""
    ua_l = ua.lower()
    scope = f"lower(regexp_extract(v, '{_XRT_SCOPE_RE}', 1))"
    joined = (
        f"lower(coalesce(array_to_string(list_transform(list_filter("
        f"regexp_extract_all({headers_col}, '{_XRT_LINE_RE}', 1),"
        f" v -> {scope} IN ('', 'unavailable_after', '{ua_l}')),"
        f" v -> CASE WHEN {scope} = '{ua_l}'"
        f" THEN regexp_replace(v, '{_XRT_STRIP_RE}', '') ELSE v END), ','), ''))"
    )

    def tok(t):
        return f"coalesce(regexp_matches(j, '(^|[,\\s]){t}([,\\s]|$)'), FALSE)"

    return f"""
        WITH xrt AS (
          SELECT {url_col} AS url, {joined} AS j FROM {src}
        )
        SELECT url,
               ({tok('noindex')} OR {tok('none')}) AS noindex,
               ({tok('nofollow')} OR {tok('none')}) AS nofollow,
               {tok('noimageindex')} AS noimageindex,
               {tok('noarchive')} AS noarchive
        FROM xrt
    """


def hreflang_reciprocity(alternates: DataFrame, url_col: str = "url",
                         lang_col: str = "hreflang",
                         alt_col: str = "alt_url") -> DataFrame:
    """Validate the declared translation graph: a hreflang edge
    url → alt_url counts only if alt_url declares a link BACK to url
    (the published hreflang contract — search engines ignore
    non-reciprocal pairs, and for a crawler a one-way declaration is
    exactly the spam shape where a scraped copy claims to be a
    translation of a reputable page that never heard of it).

    Three-state ``reciprocal``: true when the back edge exists (a
    self-declaration is its own back edge — the spec REQUIRES the
    self row, so it must not flag), false when alt_url was crawled
    (appears as a declaring source) but declares no edge back, NULL
    when alt_url is not yet a source — unverifiable, not broken.
    Two equi-joins on (url, alt_url) pairs; nothing all-pairs."""
    pairs = alternates.select(
        F.col(url_col).alias("url"),
        F.col(lang_col).alias("hreflang"),
        F.col(alt_col).alias("alt_url"),
    )
    srcs = pairs.select(F.col("url").alias("__seen")).distinct()
    back = pairs.select(
        F.col("url").alias("__b_src"), F.col("alt_url").alias("__b_dst")
    ).distinct()
    out = (
        pairs.join(srcs, pairs["alt_url"] == srcs["__seen"], "left")
        .join(back, (F.col("url") == F.col("__b_dst"))
              & (F.col("alt_url") == F.col("__b_src")), "left")
    )
    return out.select(
        "url", "hreflang", "alt_url",
        F.when(F.col("__seen").isNotNull(),
               F.col("__b_src").isNotNull()).alias("reciprocal"),
    )


def hreflang_reciprocity_sql(src: str, url_col: str = "url",
                             lang_col: str = "hreflang",
                             alt_col: str = "alt_url") -> str:
    """DuckDB replay of :func:`hreflang_reciprocity` — same two
    equi-joins, same three-state rule."""
    return f"""
        WITH hr_p AS (
          SELECT {url_col} AS url, {lang_col} AS hreflang,
                 {alt_col} AS alt_url
          FROM {src}
        ), hr_s AS (
          SELECT DISTINCT url AS seen FROM hr_p
        ), hr_b AS (
          SELECT DISTINCT url AS b_src, alt_url AS b_dst FROM hr_p
        )
        SELECT p.url, p.hreflang, p.alt_url,
               CASE WHEN s.seen IS NOT NULL
                    THEN b.b_src IS NOT NULL END AS reciprocal
        FROM hr_p p
        LEFT JOIN hr_s s ON p.alt_url = s.seen
        LEFT JOIN hr_b b ON p.url = b.b_dst AND p.alt_url = b.b_src
    """


# ---- host-frequency boilerplate removal -------------------------------------------
#
# Nav bars, cookie banners, footers: the SAME lines repeat on every
# page of a host, and per-page heuristics cannot see that — the
# signal is cross-page frequency (the jusText/boilerplate-corpus
# idea). A line is boilerplate for a host when it appears on ≥
# tau_milli/1000 of the host's pages (counted by DISTINCT pages — a
# page repeating its own line 50× is repetition, not boilerplate)
# with ≥ min_pages support. Removing it is a relational transform:
# explode lines, one (host, line) frequency agg, join the verdict
# back, reassemble in original order.


def strip_boilerplate(pages: DataFrame, host_col: str = "host",
                      url_col: str = "url", text_col: str = "text",
                      tau_milli: int = 500, min_pages: int = 3) -> DataFrame:
    """Per page: (host, url, content, n_kept, n_dropped) with the
    host's boilerplate lines removed and the survivors rejoined in
    ORIGINAL order (newline-separated). Lines compare TRIMMED; blank
    lines drop unconditionally (they are neither content nor
    evidence). Small hosts (< min_pages) keep everything — no
    evidence, no removal. Plan: one explode, one (host,line) hash agg
    over page-distinct lines, one broadcast-size join back (the
    boilerplate table is tiny: per host, only lines crossing the
    threshold), one (url) reassembly agg with an array_sort on
    (line_no) so order never depends on shuffle arrival."""
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    ).withColumn("line", F.trim(F.col("raw"))).where(F.col("line") != "")
    n_pages = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(url_col).alias("__np"))
    freq = (
        lines.select("host", "line", "url").distinct()
        .groupBy("host", "line").agg(F.count("*").alias("__n"))
    )
    boiler = (
        freq.join(n_pages, "host")
        .where((F.col("__np") >= min_pages)
               & (F.col("__n") * 1000 >= F.lit(tau_milli) * F.col("__np"))
               & (F.col("__n") >= 2))
        .select("host", "line", F.lit(True).alias("__boiler"))
    )
    flagged = lines.join(boiler, ["host", "line"], "left")
    return (
        flagged.groupBy("host", "url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct(F.col("line_no").alias("ln"),
                                         F.col("line").alias("l")),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
                "\n",
            ).alias("content"),
            F.sum(F.when(F.col("__boiler").isNull(), 1).otherwise(0))
            .alias("n_kept"),
            F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
            .alias("n_dropped"),
        )
    )


def strip_boilerplate_sql(src: str = "pages", host_col: str = "host",
                          url_col: str = "url", text_col: str = "text",
                          tau_milli: int = 500, min_pages: int = 3) -> str:
    """DuckDB replay of :func:`strip_boilerplate` — same trimmed-line
    explode (indexed list_transform for positions), same
    distinct-page frequency rule, string_agg ORDER BY line_no for the
    reassembly."""
    return f"""
        WITH sb_raw AS (
          SELECT {host_col} AS host, {url_col} AS url,
                 unnest(list_transform(string_split({text_col}, chr(10)),
                        (x, i) -> {{'l': x, 'ln': i}})) AS z
          FROM {src}
        ), sb_lines AS (
          SELECT host, url, z.ln AS line_no, trim(z.l) AS line
          FROM sb_raw WHERE trim(z.l) <> ''
        ), sb_np AS (
          SELECT {host_col} AS host, COUNT(DISTINCT {url_col}) AS np
          FROM {src} GROUP BY 1
        ), sb_freq AS (
          SELECT host, line, COUNT(*) AS n
          FROM (SELECT DISTINCT host, line, url FROM sb_lines)
          GROUP BY host, line
        ), sb_boiler AS (
          SELECT f.host, f.line
          FROM sb_freq f JOIN sb_np p USING (host)
          WHERE p.np >= {min_pages}
            AND f.n * 1000 >= {tau_milli} * p.np
            AND f.n >= 2
        ), sb_flag AS (
          SELECT l.host, l.url, l.line_no, l.line,
                 b.line IS NOT NULL AS boiler
          FROM sb_lines l LEFT JOIN sb_boiler b
            ON l.host = b.host AND l.line = b.line
        )
        SELECT host, url,
               coalesce(string_agg(CASE WHEN NOT boiler THEN line END,
                 chr(10) ORDER BY line_no), '') AS content,
               CAST(SUM(CASE WHEN NOT boiler THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped
        FROM sb_flag GROUP BY host, url
    """


# ---- interleaved image/text segments ------------------------------------------
#
# Multimodal pretraining wants the PAGE as a sequence — text block,
# image, text block — not a bag of captions (the MMC4/OBELICS
# sample shape): the model learns image-text grounding from
# adjacency, so ORDER is the payload. Relational construction: mark
# every <img> with a sentinel (a capture-group replace, so the tag
# keeps its original spelling — RE2 has no lookahead and a naive
# (?i) replace would case-fold it), split on the sentinel, and each
# piece yields up to two ordered rows: its leading image ref, then
# its visible text through the shared html_to_text chain.

_IMG_SRC_RE = r'(?is)^<img[^>]*src\s*=\s*["\x27]([^"\x27>]+)'


def interleaved_segments(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(url, seq, kind, content): the page as an ordered multimodal
    sequence — kind 'image' rows carry the src URL, 'text' rows the
    cleaned visible text between images. ``seq`` is a SPARSE ordering
    key (2·piece for the image slot, 2·piece+1 for the text slot) —
    order by it, don't index it. An <img> without src contributes no
    image row (its tag still splits the text); empty text between
    consecutive images contributes no text row; alt-text captioning
    stays extract_images' job. Map-side only: one replace, one
    explode, no shuffle."""
    marked = F.regexp_replace(F.col(html_col), r"(?i)(<img)", "\x01$1")
    pieces = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(marked, "\x01")).alias("pos", "piece"),
    )
    img_src = F.nullif(F.regexp_extract("piece", _IMG_SRC_RE, 1), F.lit(""))
    text = html_to_text(F.col("piece"))
    slots = F.array(
        F.when(img_src.isNotNull(),
               F.struct((F.col("pos") * 2).alias("seq"),
                        F.lit("image").alias("kind"),
                        img_src.alias("content"))),
        F.when(text != "",
               F.struct((F.col("pos") * 2 + 1).alias("seq"),
                        F.lit("text").alias("kind"),
                        text.alias("content"))),
    )
    return pieces.select(
        "url",
        F.explode(F.filter(slots, lambda s: s.isNotNull())).alias("seg"),
    ).select("url", F.col("seg.seq").cast("long").alias("seq"),
             "seg.kind", "seg.content")


def interleaved_segments_sql(src: str = "html_pages", url_col: str = "url",
                             html_col: str = "html") -> str:
    """DuckDB replay of :func:`interleaved_segments` — same sentinel
    capture-replace, indexed list_transform for positions, UNION ALL
    for the two slots."""
    sentinel = "\x01"
    img_re = _IMG_SRC_RE.replace("'", "''")
    text = html_to_text_sql("piece")
    return f"""
        WITH is_pieces AS (
          SELECT {url_col} AS url, z.p - 1 AS pos, z.piece AS piece
          FROM (
            SELECT {url_col},
                   unnest(list_transform(
                     string_split(regexp_replace({html_col},
                       '(?i)(<img)', '{sentinel}\\1', 'g'), '{sentinel}'),
                     (x, i) -> {{'piece': x, 'p': i}})) AS z
            FROM {src}
          )
        ), is_slots AS (
          SELECT url, CAST(pos * 2 AS BIGINT) AS seq, 'image' AS kind,
                 nullif(regexp_extract(piece, '{img_re}', 1), '') AS content
          FROM is_pieces
          UNION ALL
          SELECT url, CAST(pos * 2 + 1 AS BIGINT) AS seq, 'text' AS kind,
                 {text} AS content
          FROM is_pieces
        )
        SELECT url, seq, kind, content
        FROM is_slots
        WHERE content IS NOT NULL AND content <> ''
    """


def sitemap_scope_check(entries: DataFrame, sitemap_col: str = "sitemap_url",
                        url_col: str = "url") -> DataFrame:
    """The sitemaps.org scope rule: a sitemap may only DESCRIBE URLs
    on its own host, at or below its own directory — entries outside
    that scope must be ignored (otherwise any site could inject
    arbitrary-host URLs into a crawler's frontier through its own
    sitemap: the protocol's injection defense). Adds (in_scope,
    scope_reason): 'ok', 'cross-host', or 'above-dir'. Host compare
    is case-folded; the directory is the sitemap path up to and
    including its last '/'; the entry path must start with it. Pure
    projection — run between sitemap_entries and frontier
    admission."""
    from ..functions.urlnorm import url_host, url_path

    sm_host = url_host(F.col(sitemap_col))
    e_host = url_host(F.col(url_col))
    sm_dir = F.regexp_replace(url_path(F.col(sitemap_col)), r"[^/]*$", "")
    e_path = url_path(F.col(url_col))
    reason = (
        F.when(e_host != sm_host, "cross-host")
        .when(~e_path.startswith(sm_dir), "above-dir")
        .otherwise("ok")
    )
    return entries.withColumns(
        {"in_scope": reason == "ok", "scope_reason": reason}
    )


def sitemap_scope_check_sql(src: str, sitemap_col: str = "sitemap_url",
                            url_col: str = "url") -> str:
    """DuckDB replay of :func:`sitemap_scope_check` — same host/path
    fragments, same precedence."""
    from ..functions.urlnorm import url_host_sql, url_path_sql

    sm_host = url_host_sql(sitemap_col)
    e_host = url_host_sql(url_col)
    sm_dir = f"regexp_replace({url_path_sql(sitemap_col)}, '[^/]*$', '')"
    e_path = url_path_sql(url_col)
    reason = (
        f"CASE WHEN {e_host} <> {sm_host} THEN 'cross-host' "
        f"WHEN NOT starts_with({e_path}, {sm_dir}) THEN 'above-dir' "
        f"ELSE 'ok' END"
    )
    return f"""
        SELECT *, ({reason}) = 'ok' AS in_scope, {reason} AS scope_reason
        FROM {src}
    """


# ---- parallel-corpus mining over the hreflang graph ---------------------------
#
# Reciprocal hreflang pairs are the web's self-labeled translation
# corpus — the highest-precision source of aligned bitext a crawl
# can produce without a single model call, and translation training
# is the one LLM-data product that needs PAIRS, not documents.  The
# mine composes verified pieces: reciprocity (one-way declarations
# are the scraped-copy spam shape) -> one canonical row per
# undirected pair with BOTH declared languages (the back edge
# declares the source side's language — hreflang labels the page it
# points AT) -> text join -> integer-exact gates.  The length-ratio
# gate is the classic bitext filter (true translations have similar
# token counts; 1000*a <= ratio_milli*b both ways keeps it exact in
# both engines — no float division), and the language-consistency
# gate cross-checks each side's OBSERVED doc language against the
# partner's declaration (primary-subtag prefix, so 'en' matches
# 'en-US').  All candidate pairs are emitted with their gate flags —
# a curation pipeline filters on `aligned`, an audit reads the
# failures.  Plan: two pair-keyed equi-joins + two url-keyed doc
# joins; nothing all-pairs, token counts computed once per side.

def parallel_corpus_mine(alternates: DataFrame, docs: DataFrame,
                         ratio_milli: int = 2000, min_tokens: int = 5,
                         url_col: str = "url", lang_col: str = "hreflang",
                         alt_col: str = "alt_url",
                         doc_url_col: str = "url",
                         doc_lang_col: str = "lang",
                         text_col: str = "text") -> DataFrame:
    """(src_url, tgt_url, src_lang, tgt_lang, n_tok_src, n_tok_tgt,
    len_ok, lang_ok, aligned): one row per reciprocal cross-language
    hreflang pair (src_url < tgt_url) whose both sides were fetched;
    aligned = length-ratio AND min-token AND declared-vs-observed
    language gates all pass."""
    from ..operators.textstats import token_count

    pairs = alternates.select(
        F.col(url_col).alias("url"),
        F.col(lang_col).alias("hreflang"),
        F.col(alt_col).alias("alt_url"),
    ).distinct()
    rec = hreflang_reciprocity(pairs).where(
        F.col("reciprocal") & (F.col("url") != F.col("alt_url")))
    back = rec.select(
        F.col("url").alias("b_url"),
        F.col("alt_url").alias("b_alt"),
        F.col("hreflang").alias("b_lang"),
    )
    canon = (
        rec.join(back, (F.col("b_url") == F.col("alt_url"))
                 & (F.col("b_alt") == F.col("url")))
        .where((F.col("url") < F.col("alt_url"))
               & (F.col("b_lang") != F.col("hreflang")))
        .select(
            F.col("url").alias("src_url"),
            F.col("b_lang").alias("src_lang"),
            F.col("alt_url").alias("tgt_url"),
            F.col("hreflang").alias("tgt_lang"),
        )
    )
    d = docs.select(
        F.col(doc_url_col).alias("d_url"),
        F.col(doc_lang_col).alias("d_lang"),
        token_count(F.col(text_col)).cast("long").alias("d_ntok"),
    )
    j = (
        canon.join(d.withColumnsRenamed(
            {"d_url": "src_url", "d_lang": "src_doc_lang", "d_ntok": "n_tok_src"}),
            "src_url")
        .join(d.withColumnsRenamed(
            {"d_url": "tgt_url", "d_lang": "tgt_doc_lang", "d_ntok": "n_tok_tgt"}),
            "tgt_url")
    )
    a, b = F.col("n_tok_src"), F.col("n_tok_tgt")
    len_ok = ((a >= min_tokens) & (b >= min_tokens)
              & (a * 1000 <= b * ratio_milli) & (b * 1000 <= a * ratio_milli))
    pfx = lambda c: F.substring(c, 1, 2)  # noqa: E731 — primary subtag
    lang_ok = ((pfx(F.col("src_doc_lang")) == pfx(F.col("src_lang")))
               & (pfx(F.col("tgt_doc_lang")) == pfx(F.col("tgt_lang"))))
    return j.select(
        "src_url", "tgt_url", "src_lang", "tgt_lang",
        "n_tok_src", "n_tok_tgt",
        len_ok.alias("len_ok"), lang_ok.alias("lang_ok"),
        (len_ok & lang_ok).alias("aligned"),
    )


def parallel_corpus_mine_sql(alternates: str, docs: str,
                             ratio_milli: int = 2000,
                             min_tokens: int = 5) -> str:
    """DuckDB replay of :func:`parallel_corpus_mine` over relations
    ``alternates(url, hreflang, alt_url)`` and ``docs(url, lang,
    text)`` — same reciprocity subquery, canonical direction, token
    regex, and integer gates."""
    return f"""
        WITH pc_r AS (
          SELECT DISTINCT url, hreflang, alt_url
          FROM ({hreflang_reciprocity_sql(
              f"(SELECT DISTINCT url, hreflang, alt_url FROM {alternates}) pc_in")})
          WHERE reciprocal AND url <> alt_url
        ), pc_c AS (
          SELECT r.url AS src_url, b.hreflang AS src_lang,
                 r.alt_url AS tgt_url, r.hreflang AS tgt_lang
          FROM pc_r r
          JOIN pc_r b ON b.url = r.alt_url AND b.alt_url = r.url
          WHERE r.url < r.alt_url AND b.hreflang <> r.hreflang
        ), pc_d AS (
          SELECT url AS d_url, lang AS d_lang,
                 CAST(len(regexp_extract_all(lower(text), '[0-9a-z_]+'))
                      AS BIGINT) AS d_ntok
          FROM {docs}
        ), pc_j AS (
          SELECT c.*, s.d_lang AS src_doc_lang, s.d_ntok AS n_tok_src,
                 t.d_lang AS tgt_doc_lang, t.d_ntok AS n_tok_tgt
          FROM pc_c c
          JOIN pc_d s ON s.d_url = c.src_url
          JOIN pc_d t ON t.d_url = c.tgt_url
        )
        SELECT src_url, tgt_url, src_lang, tgt_lang, n_tok_src, n_tok_tgt,
               (n_tok_src >= {min_tokens} AND n_tok_tgt >= {min_tokens}
                AND n_tok_src * 1000 <= n_tok_tgt * {ratio_milli}
                AND n_tok_tgt * 1000 <= n_tok_src * {ratio_milli}) AS len_ok,
               (substring(src_doc_lang, 1, 2) = substring(src_lang, 1, 2)
                AND substring(tgt_doc_lang, 1, 2) = substring(tgt_lang, 1, 2))
                 AS lang_ok,
               (n_tok_src >= {min_tokens} AND n_tok_tgt >= {min_tokens}
                AND n_tok_src * 1000 <= n_tok_tgt * {ratio_milli}
                AND n_tok_tgt * 1000 <= n_tok_src * {ratio_milli}
                AND substring(src_doc_lang, 1, 2) = substring(src_lang, 1, 2)
                AND substring(tgt_doc_lang, 1, 2) = substring(tgt_lang, 1, 2))
                 AS aligned
        FROM pc_j
    """


# ---- image-sitemap extension (sitemaps.org image:*) ---------------------------
#
# The image sitemap extension is a publisher's DECLARED image
# inventory — for an image+caption crawl it beats page-parsing
# discovery on all three axes: the page need not be fetched first,
# the caption/title are structured fields instead of alt-text
# heuristics, and lastmod-style freshness rides the parent <url>
# record. Records parse as blocks-within-blocks (one
# regexp_extract_all for <url>, one for nested <image:image>), so a
# page declaring N images yields N rows without ever parsing XML as
# XML. Caption and title are optional per spec (NULL when absent);
# images outside the parent host violate the extension's spirit and
# are flagged, not dropped (the sitemap scope-check family decides
# admission).

_SMI_BLOCK_RE = r"(?s)<image:image>(.*?)</image:image>"
_SMI_LOC_RE = r"<image:loc>([^<]*)</image:loc>"
_SMI_CAPTION_RE = r"(?s)<image:caption>(.*?)</image:caption>"
_SMI_TITLE_RE = r"(?s)<image:title>(.*?)</image:title>"


def sitemap_images(pages: DataFrame, xml_col: str = "sitemap_xml",
                   keep: list | None = None) -> DataFrame:
    """Image-sitemap records → (page_url, image_url, caption, title,
    same_host) — one row per declared image, page URLs and image
    URLs canonicalized, cross-host declarations flagged."""
    from ..functions.urlnorm import canonical_url, url_host

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK_RE), 1)
    b = (
        pages.select(*cols, F.explode(blocks).alias("blk"))
        .withColumn("raw_loc", F.regexp_extract("blk", _SM_LOC_RE, 1))
        .filter(F.col("raw_loc") != "")
    )
    imgs = b.select(
        *cols,
        canonical_url("raw_loc").alias("page_url"),
        F.explode(F.regexp_extract_all("blk", F.lit(_SMI_BLOCK_RE), F.lit(1)))
        .alias("ib"),
    ).withColumn("raw_img", F.regexp_extract("ib", _SMI_LOC_RE, 1)) \
     .filter(F.col("raw_img") != "")
    return imgs.select(
        *cols,
        "page_url",
        canonical_url("raw_img").alias("image_url"),
        F.nullif(F.regexp_extract("ib", _SMI_CAPTION_RE, 1), F.lit(""))
        .alias("caption"),
        F.nullif(F.regexp_extract("ib", _SMI_TITLE_RE, 1), F.lit(""))
        .alias("title"),
        (url_host(canonical_url("raw_img")) == url_host(F.col("page_url")))
        .alias("same_host"),
    )


def sitemap_images_sql(src: str = "sitemap_pages", keep: str = "host") -> str:
    """DuckDB replay of :func:`sitemap_images` — same two-level
    block parse and canonicalization."""
    from ..functions.urlnorm import canonical_url_sql, url_host_sql

    canon_img = canonical_url_sql("regexp_extract(ib, '<image:loc>([^<]*)</image:loc>', 1)")
    canon_page = canonical_url_sql("raw_loc")
    return f"""
        WITH smi_b AS (
          SELECT {keep}, unnest(regexp_extract_all(sitemap_xml,
                   '(?s)<url>(.*?)</url>', 1)) AS blk
          FROM {src}
        ), smi_l AS (
          SELECT {keep}, blk,
                 regexp_extract(blk, '<loc>([^<]*)</loc>', 1) AS raw_loc
          FROM smi_b
        ), smi_i AS (
          SELECT {keep}, {canon_page} AS page_url,
                 unnest(regexp_extract_all(blk,
                   '(?s)<image:image>(.*?)</image:image>', 1)) AS ib
          FROM smi_l WHERE raw_loc <> ''
        ), smi_r AS (
          SELECT {keep}, page_url, ib,
                 regexp_extract(ib, '<image:loc>([^<]*)</image:loc>', 1)
                   AS raw_img
          FROM smi_i
        )
        SELECT {keep}, page_url, {canon_img} AS image_url,
               nullif(regexp_extract(ib,
                 '(?s)<image:caption>(.*?)</image:caption>', 1), '') AS caption,
               nullif(regexp_extract(ib,
                 '(?s)<image:title>(.*?)</image:title>', 1), '') AS title,
               {url_host_sql(canon_img)} = {url_host_sql('page_url')}
                 AS same_host
        FROM smi_r WHERE raw_img <> ''
    """


# ---- per-page outlink profile -------------------------------------------------
#
# Link farms and SEO spam have a distinctive outlink TEXTURE before
# any graph algorithm runs: hundreds of anchors spraying across
# many unrelated registrable domains, nearly all external. Organic
# pages link mostly within their own site plus a handful of
# external references. The profile is one rollup over the edges
# extract_outlinks already produces — n_links, distinct hosts,
# distinct registrable-ish domains (last-2-label fallback; join the
# PSL dim upstream for exactness), external fraction in exact
# per-mille — and an integer spray flag: >= min_links anchors AND
# external links outnumber internal `ext_ratio`-fold AND domains
# diverse (domains*spread >= links). Feeds the reputation/budget
# loop next to triangle/k-core texture.

def outlink_profile(outlinks: DataFrame, url_col: str = "url",
                    out_col: str = "out_url", min_links: int = 20,
                    ext_num: int = 9, ext_den: int = 10,
                    spread: int = 2) -> DataFrame:
    """(url, n_links, n_hosts, n_domains, n_external, external_milli,
    spray_flag) per source page over (url, out_url) edges."""
    from dblp_crawler_spark.functions.urlnorm import url_host

    e = outlinks.select(
        F.col(url_col).alias("url"),
        url_host(url_col).alias("src_host"),
        url_host(out_col).alias("dst_host"),
    )
    dom = F.regexp_extract(F.col("dst_host"), r"([^.]+\.[^.]+)$", 1)
    g = e.withColumn("dst_dom", dom).groupBy("url").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct(F.col("dst_host")).alias("n_hosts"),
        F.count_distinct(F.col("dst_dom")).alias("n_domains"),
        F.count(F.when(F.col("dst_host") != F.col("src_host"), 1))
        .alias("n_external"),
    )
    ext_milli = F.floor(F.col("n_external") * 1000 / F.col("n_links")) \
        .cast("long")
    spray = ((F.col("n_links") >= min_links)
             & (F.col("n_external") * ext_den >= F.col("n_links") * ext_num)
             & (F.col("n_domains") * spread >= F.col("n_links")))
    return g.withColumns({"external_milli": ext_milli,
                          "spray_flag": spray})


def outlink_profile_sql(src: str, url_col: str = "url",
                        out_col: str = "out_url", min_links: int = 20,
                        ext_num: int = 9, ext_den: int = 10,
                        spread: int = 2) -> str:
    """DuckDB replay of :func:`outlink_profile` — same host/domain
    extraction and integer gates."""
    from dblp_crawler_spark.functions.urlnorm import url_host_sql

    return f"""
        WITH op_e AS (
          SELECT {url_col} AS url,
                 {url_host_sql(url_col)} AS src_host,
                 {url_host_sql(out_col)} AS dst_host
          FROM {src}
        ), op_g AS (
          SELECT url, CAST(COUNT(*) AS BIGINT) AS n_links,
                 CAST(COUNT(DISTINCT dst_host) AS BIGINT) AS n_hosts,
                 CAST(COUNT(DISTINCT regexp_extract(dst_host,
                      '([^.]+\\.[^.]+)$', 1)) AS BIGINT) AS n_domains,
                 CAST(COUNT(CASE WHEN dst_host <> src_host THEN 1 END)
                      AS BIGINT) AS n_external
          FROM op_e GROUP BY url
        )
        SELECT *,
               CAST(floor(n_external * 1000 / n_links) AS BIGINT)
                 AS external_milli,
               n_links >= {min_links}
                 AND n_external * {ext_den} >= n_links * {ext_num}
                 AND n_domains * {spread} >= n_links AS spray_flag
        FROM op_g
    """


# ---- meta-refresh redirects ---------------------------------------------------
#
# <meta http-equiv="refresh"> is the redirect channel that never
# touches HTTP: parked domains, consent walls, and legacy sites hop
# through it, and a crawler that ignores it records the hop page as
# content while missing the real resource. Search engines treat a
# 0-5 s refresh as a redirect (301-equivalent) and longer delays as
# content — the flag mirrors that. Attribute order is free in HTML,
# so the tag match keys on the http-equiv attribute alone and the
# content attribute is pulled from the same tag text in a second
# extract; the URL part resolves against the page like any href.

_META_REFRESH_TAG_RE = (
    r"""(?is)<meta\b([^>]*http-equiv\s*=\s*["']?refresh["']?[^>]*)>""")
_META_REFRESH_CONTENT_RE = r"""(?is)content\s*=\s*["']([^"']*)["']"""
_META_REFRESH_URL_RE = r"""(?i)url\s*=\s*['"]?([^'";\s]+)"""


def meta_refresh(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html",
                 redirect_max_s: int = 5) -> DataFrame:
    """(url, delay_s, target_url, treat_as_redirect) from the first
    meta-refresh tag; all NULL when the page has none.  target_url
    resolves against the page URL; a refresh without a url= part
    (self-reload) keeps target NULL.  treat_as_redirect when a
    target exists and delay <= redirect_max_s."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    tag = F.regexp_extract(F.col(html_col), _META_REFRESH_TAG_RE, 1)
    content = F.regexp_extract(tag, _META_REFRESH_CONTENT_RE, 1)
    raw = F.nullif(F.regexp_extract(content, _META_REFRESH_URL_RE, 1), F.lit(""))
    delay = F.nullif(
        F.regexp_extract(content, r"^\s*([0-9]+)", 1), F.lit("")
    ).try_cast("long")
    s = pages.select(
        F.col(url_col).alias("url"),
        F.when(content != "", delay).alias("delay_s"),
        F.when(raw.isNotNull(), resolve_url(url_col, raw)).alias("target_url"),
    )
    return s.withColumn(
        "treat_as_redirect",
        F.when(F.col("delay_s").isNotNull(),
               F.col("target_url").isNotNull()
               & (F.col("delay_s") <= redirect_max_s)),
    )


def meta_refresh_sql(src: str, url_col: str = "url", html_col: str = "html",
                     redirect_max_s: int = 5) -> str:
    """DuckDB replay of :func:`meta_refresh` — same tag/content/url
    extracts and redirect rule."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    tag = (f"regexp_extract({html_col}, "
           f"'(?is)<meta\\b([^>]*http-equiv\\s*=\\s*[\"'']?refresh[\"'']?[^>]*)>', 1)")
    content = f"regexp_extract({tag}, '(?is)content\\s*=\\s*[\"'']([^\"'']*)[\"'']', 1)"
    raw = f"nullif(regexp_extract({content}, '(?i)url\\s*=\\s*[''\"]?([^''\";\\s]+)', 1), '')"
    delay = (f"CAST(TRY_CAST(nullif(regexp_extract({content}, "
             f"'^\\s*([0-9]+)', 1), '') AS BIGINT) AS BIGINT)")
    return f"""
        WITH mr_x AS (
          SELECT {url_col} AS url,
                 CASE WHEN {content} <> '' THEN {delay} END AS delay_s,
                 CASE WHEN {raw} IS NOT NULL
                      THEN {resolve_url_sql(url_col, raw)} END AS target_url
          FROM {src}
        )
        SELECT *, CASE WHEN delay_s IS NOT NULL THEN
                 target_url IS NOT NULL AND delay_s <= {redirect_max_s} END
               AS treat_as_redirect
        FROM mr_x
    """


# ---- URL mentions in plain text -----------------------------------------------
#
# Plaintext corpora — PDFs, READMEs, forum posts, the documents
# table itself — cite URLs without anchors, and a frontier that only
# follows <a href> never sees them. The extractor is one
# regexp_extract_all for http(s) URLs with trailing punctuation
# stripped (the classic "see https://x.org/p." citation: the final
# '.' is prose, not path — likewise , ; : ! ? ) ] } ' \"), then
# canonicalization and per-URL mention counting. One regex pass +
# one explode + one hash agg; feeds frontier admission like any
# discovery channel.

_TEXT_URL_RE = r"""(?i)https?://[^\s<>"']+"""
_TEXT_URL_TRAIL_RE = r"""[.,;:!?)\]}'"]+$"""


def text_url_mentions(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(url, n_mentions, n_docs) over every http(s) URL cited in the
    corpus text, trailing prose punctuation stripped, canonicalized."""
    from dblp_crawler_spark.functions.urlnorm import canonical_url

    raw = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(_TEXT_URL_RE), F.lit(0))).alias("__raw"),
    )
    cleaned = raw.select(
        "doc_id",
        canonical_url(F.regexp_replace(F.col("__raw"), _TEXT_URL_TRAIL_RE, ""))
        .alias("url"),
    )
    return cleaned.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
    )


def text_url_mentions_sql(src: str, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`text_url_mentions` — same regexes and
    canonicalization."""
    from dblp_crawler_spark.functions.urlnorm import canonical_url_sql

    # patterns rendered from the SAME Python constants (quote-escaped)
    trail = _TEXT_URL_TRAIL_RE.replace("'", "''")
    urlre = _TEXT_URL_RE.replace("'", "''")
    canon = canonical_url_sql(f"regexp_replace(u, '{trail}', '')")
    return f"""
        WITH tu_r AS (
          SELECT {id_col} AS doc_id,
                 unnest(regexp_extract_all({text_col}, '{urlre}')) AS u
          FROM {src}
        ), tu_c AS (
          SELECT doc_id, {canon} AS url FROM tu_r
        )
        SELECT url, CAST(COUNT(*) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tu_c GROUP BY url
    """


# ---- OpenGraph image+caption extraction ---------------------------------------
#
# The third image+caption discovery channel, and on the modern web
# often the richest: nearly every CMS emits OpenGraph meta tags, and
# og:image / og:image:alt / og:description are EDITORIAL choices —
# the page's own statement of its representative image and text,
# far cleaner than scraping an arbitrary <img>. Tag matching keys on
# the quote-delimited property value (so og:image never matches
# og:image:alt), accepts property= or name= (both occur in the
# wild) in any attribute order, takes the FIRST occurrence per
# field (OpenGraph's array semantics use the first as primary), and
# resolves og:image against the page URL.

def _og_tag(field: str) -> str:
    return (r"(?is)<meta\b([^>]*(?:property|name)\s*=\s*"
            + f"""["']{field}["']""" + r"[^>]*)>")


_OG_CONTENT_RE = r"""(?is)content\s*=\s*["']([^"']*)["']"""


def og_image_caption(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """(url, og_image_url, og_alt, og_title, og_description) from
    the page's OpenGraph tags — NULL per missing field, image URL
    resolved against the page."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    def field(name):
        tag = F.regexp_extract(F.col(html_col), _og_tag(name), 1)
        return F.nullif(F.regexp_extract(tag, _OG_CONTENT_RE, 1), F.lit(""))

    img = field("og:image")
    return pages.select(
        F.col(url_col).alias("url"),
        F.when(img.isNotNull(),
               resolve_url(url_col, img)).alias("og_image_url"),
        field("og:image:alt").alias("og_alt"),
        field("og:title").alias("og_title"),
        field("og:description").alias("og_description"),
    )


def og_image_caption_sql(src: str, url_col: str = "url",
                         html_col: str = "html") -> str:
    """DuckDB replay of :func:`og_image_caption` — same quote-
    delimited tag matches and first-occurrence rule."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    def field(name):
        pat = _og_tag(name).replace("'", "''")
        cpat = _OG_CONTENT_RE.replace("'", "''")
        tag = f"regexp_extract({html_col}, '{pat}', 1)"
        return f"nullif(regexp_extract({tag}, '{cpat}', 1), '')"

    img = field("og:image")
    return f"""
        SELECT {url_col} AS url,
               CASE WHEN {img} IS NOT NULL
                    THEN {resolve_url_sql(url_col, img)} END AS og_image_url,
               {field("og:image:alt")} AS og_alt,
               {field("og:title")} AS og_title,
               {field("og:description")} AS og_description
        FROM {src}
    """


# ---- per-host caption diversity -----------------------------------------------
#
# Generated galleries share caption TEMPLATES — ten thousand images
# captioned "beautiful sunset wallpaper hd" — and per-image gates
# can't see it: the signal is the host-level caption distribution.
# Low distinct-caption ratio or one caption owning most of the host
# is the stock-farm/template smell that routes a host's images to
# heavier dedup (or out). Trimmed case-folded captions compare;
# NULL/empty captions count separately (missing captions are their
# own quality problem, not a template). One (host, caption) rollup
# + one host rollup; integer per-mille thresholds.

def caption_diversity(imgs: DataFrame, host_col: str = "host",
                      caption_col: str = "caption", min_images: int = 8,
                      top_milli: int = 500) -> DataFrame:
    """(host, n_images, n_captioned, n_distinct, top_share_milli,
    templated) per host; templated when >= min_images captioned
    images and the most common caption owns >= top_milli/1000 of
    them."""
    c = F.lower(F.trim(F.col(caption_col)))
    base = imgs.select(
        F.col(host_col).alias("host"),
        F.when(c != "", c).alias("cap"),
    )
    per_cap = (
        base.where(F.col("cap").isNotNull())
        .groupBy("host", "cap").agg(F.count(F.lit(1)).alias("n"))
    )
    per_host = per_cap.groupBy("host").agg(
        F.sum("n").alias("n_captioned"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("__top"),
    )
    totals = base.groupBy("host").agg(F.count(F.lit(1)).alias("n_images"))
    j = totals.join(per_host, "host", "left")
    top_milli_c = F.floor(F.coalesce(F.col("__top"), F.lit(0)) * 1000
                          / F.greatest(F.col("n_captioned"), F.lit(1))) \
        .cast("long")
    return j.select(
        "host", "n_images",
        F.coalesce(F.col("n_captioned"), F.lit(0).cast("long"))
        .alias("n_captioned"),
        F.coalesce(F.col("n_distinct"), F.lit(0).cast("long"))
        .alias("n_distinct"),
        top_milli_c.alias("top_share_milli"),
        ((F.coalesce(F.col("n_captioned"), F.lit(0)) >= min_images)
         & (top_milli_c >= top_milli)).alias("templated"),
    )


def caption_diversity_sql(src: str, host_col: str = "host",
                          caption_col: str = "caption", min_images: int = 8,
                          top_milli: int = 500) -> str:
    """DuckDB replay of :func:`caption_diversity`."""
    return f"""
        WITH cd_b AS (
          SELECT {host_col} AS host,
                 nullif(lower(trim({caption_col})), '') AS cap
          FROM {src}
        ), cd_c AS (
          SELECT host, cap, CAST(COUNT(*) AS BIGINT) AS n
          FROM cd_b WHERE cap IS NOT NULL GROUP BY host, cap
        ), cd_h AS (
          SELECT host, CAST(SUM(n) AS BIGINT) AS n_captioned,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(MAX(n) AS BIGINT) AS top
          FROM cd_c GROUP BY host
        ), cd_t AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n_images
          FROM cd_b GROUP BY host
        )
        SELECT t.host, t.n_images,
               COALESCE(h.n_captioned, 0) AS n_captioned,
               COALESCE(h.n_distinct, 0) AS n_distinct,
               CAST(floor(COALESCE(h.top, 0) * 1000
                    / greatest(COALESCE(h.n_captioned, 0), 1)) AS BIGINT)
                 AS top_share_milli,
               COALESCE(h.n_captioned, 0) >= {min_images}
                 AND CAST(floor(COALESCE(h.top, 0) * 1000
                     / greatest(COALESCE(h.n_captioned, 0), 1)) AS BIGINT)
                     >= {top_milli} AS templated
        FROM cd_t t LEFT JOIN cd_h h USING (host)
    """


# ---- figure/figcaption, data-URI, and lazy-load image channels --------------------
#
# Three more discovery channels for image+caption pairs beyond
# <img alt>/srcset (extract_images), OpenGraph (og_image_caption)
# and image sitemaps (sitemap_images):
#   * <figure><img><figcaption> — the figcaption is an EDITORIAL
#     caption written for the reader (not an accessibility fallback
#     or a filename), typically the highest-quality text a page
#     offers about its image;
#   * data: URIs — images inlined into the HTML itself, which never
#     hit the fetch pipeline at all (no URL to schedule, no payload
#     row in the store) and so are invisible unless mined here;
#   * lazy-load idioms — src holds a 1×1 placeholder while data-src/
#     data-srcset carries the real asset, hiding most below-the-fold
#     images from a naive src-only harvester.
# All pure regexp + posexplode, map-side; RE2-safe patterns shared
# verbatim with the DuckDB replays.

_FIGURE_RE = r"(?si)<figure[^>]*>.*?</figure>"
_FIGCAP_RE = r"(?si)<figcaption[^>]*>(.*?)</figcaption>"
_DATA_SRC_RE = r"""(?i)[\s"']data-src\s*=\s*["']?([^"'\s>]+)"""
_DATA_SRCSET_DQ_RE = r"""(?i)[\s"']data-srcset\s*=\s*"([^"]*)\""""
_DATA_SRCSET_SQ_RE = r"""(?i)[\s"']data-srcset\s*=\s*'([^']*)'"""
_LOADING_RE = r"""(?i)[\s"']loading\s*=\s*["']?(lazy|eager)"""
_DATA_URI_RE = r"^data:image/([a-z0-9.+-]+);base64,([A-Za-z0-9+/]+={0,2})$"


def figure_captions(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """One row per <figure> holding an <img>: (url, fig_idx,
    img_url, caption) — caption is the figcaption's text with inner
    markup stripped and whitespace collapsed, NULL when the figure
    has no figcaption (the pair gate downstream decides; absence is
    evidence, not an error). The img URL is the figure's FIRST <img>
    tag's src resolved against the page; figures without a
    resolvable img drop."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    figs = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_FIGURE_RE), F.lit(0))
        ).alias("fig_idx", "__fig"),
    )
    g = F.col("__fig")
    img_tag = F.regexp_extract(g, _IMG_TAG_RE, 0)
    src = F.nullif(F.regexp_extract(img_tag, _SRC_RE, 1), F.lit(""))
    cap_raw = F.nullif(F.regexp_extract(g, _FIGCAP_RE, 1), F.lit(""))
    caption = F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(cap_raw, r"<[^>]*>", ""), r"\s+", " "
            )
        ),
        F.lit(""),
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    return figs.where(resolvable_href(src)).select(
        "url",
        F.col("fig_idx").cast("int").alias("fig_idx"),
        resolve_url("url", src).alias("img_url"),
        caption.alias("caption"),
    )


def figure_captions_sql(src: str, url_col: str = "url",
                        html_col: str = "html") -> str:
    """DuckDB replay of :func:`figure_captions`."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    def esc(p):
        return p.replace("'", "''")

    return f"""
        WITH fc_f AS (
          SELECT {url_col} AS url, t.i - 1 AS fig_idx, t.fig
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_FIGURE_RE)}', 0)) AS fig,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_FIGURE_RE)}', 0), 1) AS i) t
        ), fc_p AS (
          SELECT url, fig_idx,
                 NULLIF(regexp_extract(regexp_extract(fig,
                   '{esc(_IMG_TAG_RE)}', 0), '{esc(_SRC_RE)}', 1), '') AS s,
                 NULLIF(trim(regexp_replace(regexp_replace(
                   NULLIF(regexp_extract(fig, '{esc(_FIGCAP_RE)}', 1), ''),
                   '<[^>]*>', '', 'g'), '\\s+', ' ', 'g')), '') AS caption
          FROM fc_f
        )
        SELECT url, CAST(fig_idx AS INT) AS fig_idx,
               {resolve_url_sql('url', 's')} AS img_url, caption
        FROM fc_p
        WHERE {resolvable_href_sql('s')}
    """


def data_uri_images(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Inline base64 images mined from the page itself: (url,
    tag_idx, declared_fmt, fmt, width, height, payload_bytes) —
    declared_fmt from the data: URI's media type, fmt/width/height
    from SNIFFING the decoded bytes with the same header tiers the
    fetch path uses (a data:image/png URI can lie about its payload
    exactly like a Content-Type header). Only strictly
    base64-grammar-valid URIs decode; everything else drops."""
    from dblp_crawler_spark.operators.sniff import image_dims

    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_TAG_RE), F.lit(0))
        ).alias("tag_idx", "__tag"),
    )
    src = F.nullif(F.regexp_extract(F.col("__tag"), _SRC_RE, 1), F.lit(""))
    parsed = tags.select(
        "url",
        F.col("tag_idx").cast("int").alias("tag_idx"),
        F.nullif(F.regexp_extract(src, _DATA_URI_RE, 1),
                 F.lit("")).alias("declared_fmt"),
        F.nullif(F.regexp_extract(src, _DATA_URI_RE, 2),
                 F.lit("")).alias("__b64"),
    ).where(
        F.col("__b64").isNotNull() & (F.length("__b64") % 4 == 0)
    )
    blobs = parsed.withColumn("bytes", F.unbase64(F.col("__b64")))
    return image_dims(blobs).select(
        "url", "tag_idx", "declared_fmt", "fmt", "width", "height",
        F.octet_length("bytes").cast("long").alias("payload_bytes"),
    )


def data_uri_images_sql(src: str, url_col: str = "url",
                        html_col: str = "html") -> str:
    """DuckDB replay of :func:`data_uri_images` — from_base64 +
    the shared image_dims/sniff fragments over the decoded hex."""
    from dblp_crawler_spark.operators.sniff import (
        image_dims_sql,
        sniff_case_sql,
    )

    def esc(p):
        return p.replace("'", "''")

    fmt_case, w_sql, h_sql = image_dims_sql("h")
    return f"""
        WITH du_t AS (
          SELECT {url_col} AS url, t.i - 1 AS tag_idx, t.tag
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0)) AS tag,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0), 1) AS i) t
        ), du_s AS (
          SELECT url, tag_idx,
                 NULLIF(regexp_extract(tag, '{esc(_SRC_RE)}', 1), '') AS s
          FROM du_t
        ), du_p AS (
          SELECT url, tag_idx,
                 NULLIF(regexp_extract(s, '{esc(_DATA_URI_RE)}', 1), '')
                   AS declared_fmt,
                 NULLIF(regexp_extract(s, '{esc(_DATA_URI_RE)}', 2), '')
                   AS b64
          FROM du_s WHERE NULLIF(regexp_extract(s,
                 '{esc(_DATA_URI_RE)}', 2), '') IS NOT NULL
            AND strlen(regexp_extract(s, '{esc(_DATA_URI_RE)}', 2)) % 4 = 0
        ), du_h AS (
          SELECT url, tag_idx, declared_fmt,
                 hex(from_base64(b64)) AS h
          FROM du_p
        ), du_f AS (
          SELECT url, tag_idx, declared_fmt, h,
                 {sniff_case_sql('h')} AS fmt
          FROM du_h
        )
        SELECT url, CAST(tag_idx AS INT) AS tag_idx, declared_fmt, fmt,
               {w_sql} AS width, {h_sql} AS height,
               CAST(strlen(h) // 2 AS BIGINT) AS payload_bytes
        FROM du_f
    """


def lazyload_images(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Lazy-load salvage: one row per <img> tag with (url, tag_idx,
    src_url, lazy_url, loading, effective_url, is_lazy) — the
    effective asset is data-src when present (falling back to the
    widest data-srcset candidate's URL, then src), and is_lazy marks
    tags whose real asset would be MISSED by a src-only harvester
    (data-src/data-srcset present, or loading=lazy with a data: src
    placeholder)."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_TAG_RE), F.lit(0))
        ).alias("tag_idx", "__tag"),
    )
    t = F.col("__tag")
    src = F.nullif(F.regexp_extract(t, _SRC_RE, 1), F.lit(""))
    dsrc = F.nullif(F.regexp_extract(t, _DATA_SRC_RE, 1), F.lit(""))
    dss = F.coalesce(
        F.nullif(F.regexp_extract(t, _DATA_SRCSET_DQ_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(t, _DATA_SRCSET_SQ_RE, 1), F.lit("")),
    )
    # first data-srcset candidate's URL (the salvage fallback; full
    # widest-candidate election stays extract_images' job)
    dss_url = F.nullif(
        F.regexp_extract(F.trim(F.split(dss, ",").getItem(0)),
                         r"^(\S+)", 1), F.lit(""))
    loading = F.nullif(F.lower(F.regexp_extract(t, _LOADING_RE, 1)), F.lit(""))
    staged = tags.select(
        "url",
        F.col("tag_idx").cast("int").alias("tag_idx"),
        src.alias("__src"),
        dsrc.alias("__dsrc"),
        dss_url.alias("__dss"),
        loading.alias("loading"),
    )
    eff = F.coalesce(F.col("__dsrc"), F.col("__dss"), F.col("__src"))
    is_lazy = (
        F.col("__dsrc").isNotNull()
        | F.col("__dss").isNotNull()
        | ((F.col("loading") == "lazy")
           & F.coalesce(F.col("__src").startswith("data:"), F.lit(False)))
    )
    return staged.select(
        "url", "tag_idx",
        resolve_url("url", F.col("__src")).alias("src_url"),
        resolve_url("url", F.coalesce(F.col("__dsrc"), F.col("__dss"))
                    ).alias("lazy_url"),
        "loading",
        resolve_url("url", eff).alias("effective_url"),
        is_lazy.alias("is_lazy"),
    )


def lazyload_images_sql(src: str, url_col: str = "url",
                        html_col: str = "html") -> str:
    """DuckDB replay of :func:`lazyload_images`."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url_sql

    def esc(p):
        return p.replace("'", "''")

    return f"""
        WITH lz_t AS (
          SELECT {url_col} AS url, t.i - 1 AS tag_idx, t.tag
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0)) AS tag,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_IMG_TAG_RE)}', 0), 1) AS i) t
        ), lz_a AS (
          SELECT url, tag_idx,
                 NULLIF(regexp_extract(tag, '{esc(_SRC_RE)}', 1), '') AS s,
                 NULLIF(regexp_extract(tag, '{esc(_DATA_SRC_RE)}', 1), '')
                   AS ds,
                 COALESCE(
                   NULLIF(regexp_extract(tag,
                     '{esc(_DATA_SRCSET_DQ_RE)}', 1), ''),
                   NULLIF(regexp_extract(tag,
                     '{esc(_DATA_SRCSET_SQ_RE)}', 1), '')) AS dss,
                 NULLIF(lower(regexp_extract(tag,
                   '{esc(_LOADING_RE)}', 1)), '') AS loading
          FROM lz_t
        ), lz_b AS (
          SELECT url, tag_idx, s, ds, loading,
                 NULLIF(regexp_extract(trim(string_split(dss, ',')[1]),
                        '^(\\S+)', 1), '') AS dssu
          FROM lz_a
        )
        SELECT url, CAST(tag_idx AS INT) AS tag_idx,
               {resolve_url_sql('url', 's')} AS src_url,
               {resolve_url_sql('url', 'COALESCE(ds, dssu)')} AS lazy_url,
               loading,
               {resolve_url_sql('url', 'COALESCE(ds, dssu, s)')}
                 AS effective_url,
               ds IS NOT NULL OR dssu IS NOT NULL
                 OR (loading = 'lazy'
                     AND COALESCE(starts_with(s, 'data:'), false)) AS is_lazy
        FROM lz_b
    """


# ---- video sitemap extension ------------------------------------------------------
#
# The third sitemap extension tier next to sitemap_images and
# sitemap_scheduling_hints: publishers DECLARE their video inventory
# (content URL, thumbnail, title/description, duration) per page —
# for a video-text corpus this is the richest discovery channel
# there is, because the declaration carries editorial metadata the
# crawler would otherwise have to mine from the page. Same
# two-level block parse as sitemap_images; the spec says duration is
# seconds in [1, 28800] and values outside that band are declared-
# but-invalid (kept with valid_duration=false — absence of validity
# is evidence for the host scorecard, not a dropped row).

_SMV_BLOCK_RE = r"(?s)<video:video>(.*?)</video:video>"
_SMV_CONTENT_RE = r"<video:content_loc>([^<]*)</video:content_loc>"
_SMV_PLAYER_RE = r"<video:player_loc[^>]*>([^<]*)</video:player_loc>"
_SMV_THUMB_RE = r"<video:thumbnail_loc>([^<]*)</video:thumbnail_loc>"
_SMV_TITLE_RE = r"(?s)<video:title>(.*?)</video:title>"
_SMV_DESC_RE = r"(?s)<video:description>(.*?)</video:description>"
_SMV_DUR_RE = r"<video:duration>(\d+)</video:duration>"


def sitemap_videos(pages: DataFrame, xml_col: str = "sitemap_xml",
                   keep: list | None = None) -> DataFrame:
    """Video-sitemap records → (page_url, video_url, thumbnail_url,
    title, description, duration_s, valid_duration, same_host) —
    one row per declared video; video_url prefers content_loc (the
    raw media file) and falls back to player_loc (an embed page),
    both canonicalized; duration validated against the spec's
    [1, 28800] band."""
    from ..functions.urlnorm import canonical_url, url_host

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK_RE), 1)
    b = (
        pages.select(*cols, F.explode(blocks).alias("blk"))
        .withColumn("raw_loc", F.regexp_extract("blk", _SM_LOC_RE, 1))
        .filter(F.col("raw_loc") != "")
    )
    vids = b.select(
        *cols,
        canonical_url("raw_loc").alias("page_url"),
        F.explode(F.regexp_extract_all("blk", F.lit(_SMV_BLOCK_RE), F.lit(1)))
        .alias("vb"),
    ).withColumn(
        "raw_vid",
        F.coalesce(
            F.nullif(F.regexp_extract("vb", _SMV_CONTENT_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract("vb", _SMV_PLAYER_RE, 1), F.lit("")),
        ),
    ).filter(F.col("raw_vid").isNotNull())
    dur = F.nullif(F.regexp_extract("vb", _SMV_DUR_RE, 1), F.lit("")).cast("long")
    return vids.select(
        *cols,
        "page_url",
        canonical_url("raw_vid").alias("video_url"),
        canonical_url(
            F.nullif(F.regexp_extract("vb", _SMV_THUMB_RE, 1), F.lit(""))
        ).alias("thumbnail_url"),
        F.nullif(F.trim(F.regexp_extract("vb", _SMV_TITLE_RE, 1)),
                 F.lit("")).alias("title"),
        F.nullif(F.trim(F.regexp_extract("vb", _SMV_DESC_RE, 1)),
                 F.lit("")).alias("description"),
        dur.alias("duration_s"),
        F.when(dur.isNotNull(), dur.between(1, 28800)).alias("valid_duration"),
        (url_host(canonical_url("raw_vid")) == url_host(F.col("page_url")))
        .alias("same_host"),
    )


def sitemap_videos_sql(src: str = "sitemap_pages", keep: str = "host") -> str:
    """DuckDB replay of :func:`sitemap_videos`."""
    from ..functions.urlnorm import canonical_url_sql, url_host_sql

    raw_vid = (f"COALESCE(NULLIF(regexp_extract(vb, '{_SMV_CONTENT_RE}', 1), ''),"
               f" NULLIF(regexp_extract(vb, '{_SMV_PLAYER_RE}', 1), ''))")
    canon_vid = canonical_url_sql("raw_vid")
    canon_thumb = canonical_url_sql(
        f"NULLIF(regexp_extract(vb, '{_SMV_THUMB_RE}', 1), '')")
    canon_page = canonical_url_sql("raw_loc")
    return f"""
        WITH smv_b AS (
          SELECT {keep}, unnest(regexp_extract_all(sitemap_xml,
                   '{_SM_BLOCK_RE}', 1)) AS blk
          FROM {src}
        ), smv_l AS (
          SELECT {keep}, blk,
                 regexp_extract(blk, '{_SM_LOC_RE}', 1) AS raw_loc
          FROM smv_b
        ), smv_v AS (
          SELECT {keep}, {canon_page} AS page_url,
                 unnest(regexp_extract_all(blk, '{_SMV_BLOCK_RE}', 1)) AS vb
          FROM smv_l WHERE raw_loc <> ''
        ), smv_r AS (
          SELECT {keep}, page_url, vb, {raw_vid} AS raw_vid,
                 TRY_CAST(NULLIF(regexp_extract(vb, '{_SMV_DUR_RE}', 1), '')
                          AS BIGINT) AS dur
          FROM smv_v
        )
        SELECT {keep}, page_url, {canon_vid} AS video_url,
               {canon_thumb} AS thumbnail_url,
               NULLIF(trim(regexp_extract(vb, '{_SMV_TITLE_RE}', 1)), '')
                 AS title,
               NULLIF(trim(regexp_extract(vb, '{_SMV_DESC_RE}', 1)), '')
                 AS description,
               dur AS duration_s,
               CASE WHEN dur IS NOT NULL
                    THEN dur BETWEEN 1 AND 28800 END AS valid_duration,
               {url_host_sql(canon_vid)} = {url_host_sql('page_url')}
                 AS same_host
        FROM smv_r WHERE raw_vid IS NOT NULL
    """


# ---- caption election across channels ---------------------------------------------
#
# A page can caption the same image through several channels at
# once: a <figcaption> (editorial, written for the reader), the
# OpenGraph og:image:alt/description (editorial but page-level), and
# the <img alt> (accessibility fallback, often a filename). An
# image+caption miner must pick ONE text per image, and the pick
# should be the strongest channel available — the LAION-style
# "caption source" election, here as a deterministic window over the
# union of the per-channel extractors (each already an oracled
# fragment; the replay chains the same three).

CAPTION_CHANNEL_PRIORITY = ["figcaption", "og", "img_alt"]


def caption_election(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Per (page, image): all caption candidates from the three HTML
    channels, and the elected winner by channel priority (figcaption
    > og > img_alt), ties broken on caption text for determinism.
    Returns (url, img_url, caption, channel, n_candidates) — one row
    per image that has at least one non-NULL caption; images no
    channel captions simply don't elect (the pair gate downstream
    sees them via extract_images, not here).

    Scale shape: three map-side extractions unioned, ONE window keyed
    (url, img_url) — no self-joins, page HTML never shuffles (only
    the slim candidate rows)."""
    figs = figure_captions(pages, url_col, html_col).where(
        F.col("caption").isNotNull()
    ).select(
        "url", "img_url", "caption",
        F.lit(1).alias("__prio"), F.lit("figcaption").alias("channel"),
    )
    # og channel built from the RAW extracted fields so the cheap
    # pre-filter runs before the (huge) resolution expression — the
    # same codegen discipline as resolvable_href: filtering on the
    # computed og_image_url would push the resolution into the
    # Filter node and blow the 64 KB generated-method limit.
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href,
        resolve_url,
    )

    def _og_field(name):
        tag = F.regexp_extract(F.col(html_col), _og_tag(name), 1)
        return F.nullif(F.regexp_extract(tag, _OG_CONTENT_RE, 1), F.lit(""))

    og_img = _og_field("og:image")
    og_cap = F.coalesce(_og_field("og:image:alt"), _og_field("og:description"))
    ogc = pages.where(
        og_img.isNotNull() & resolvable_href(og_img) & og_cap.isNotNull()
    ).select(
        F.col(url_col).alias("url"),
        resolve_url(url_col, og_img).alias("img_url"),
        og_cap.alias("caption"),
        F.lit(2).alias("__prio"), F.lit("og").alias("channel"),
    )
    alts = extract_images(pages, url_col, html_col).where(
        F.col("alt").isNotNull()
    ).select(
        "url", "img_url", F.col("alt").alias("caption"),
        F.lit(3).alias("__prio"), F.lit("img_alt").alias("channel"),
    )
    cands = figs.unionByName(ogc).unionByName(alts)
    w = Window.partitionBy("url", "img_url").orderBy("__prio", "caption")
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_candidates",
                    F.count(F.lit(1)).over(
                        Window.partitionBy("url", "img_url")))
        .where(F.col("__rn") == 1)
        .select("url", "img_url", "caption", "channel",
                F.col("n_candidates").cast("long").alias("n_candidates"))
    )


def caption_election_sql(src: str, url_col: str = "url",
                         html_col: str = "html") -> str:
    """DuckDB replay of :func:`caption_election` — chains the three
    channel fragments, same union, same window."""
    figs = figure_captions_sql(src, url_col, html_col)
    og = og_image_caption_sql(src, url_col, html_col)
    alts = extract_images_sql(src, url_col, html_col)
    return f"""
        WITH ce_f AS (
          SELECT url, img_url, caption, 1 AS prio,
                 'figcaption' AS channel
          FROM ({figs}) f WHERE caption IS NOT NULL
        ), ce_o AS (
          SELECT url, og_image_url AS img_url,
                 COALESCE(og_alt, og_description) AS caption,
                 2 AS prio, 'og' AS channel
          FROM ({og}) o
          WHERE og_image_url IS NOT NULL
            AND COALESCE(og_alt, og_description) IS NOT NULL
        ), ce_a AS (
          SELECT url, img_url, alt AS caption, 3 AS prio,
                 'img_alt' AS channel
          FROM ({alts}) a WHERE alt IS NOT NULL
        ), ce_u AS (
          SELECT * FROM ce_f UNION ALL SELECT * FROM ce_o
          UNION ALL SELECT * FROM ce_a
        ), ce_r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY url, img_url
                   ORDER BY prio, caption) AS rn,
                 COUNT(*) OVER (PARTITION BY url, img_url) AS n_candidates
          FROM ce_u
        )
        SELECT url, img_url, caption, channel,
               CAST(n_candidates AS BIGINT) AS n_candidates
        FROM ce_r WHERE rn = 1
    """


# ---- JSON-LD ImageObject extraction -----------------------------------------------
#
# schema.org structured data is the machine-readable metadata
# channel publishers actually maintain (news, stock photo, recipe
# sites), and for images it carries what NO other channel does:
# LICENSE metadata — schema.org's license + acquireLicensePage are
# the fields Google's image-license program indexes, and a
# compliance-clean image dataset needs them at mining time, not
# after a takedown. Script blocks are cut with a bounded regex, but
# the PAYLOAD is parsed with real JSON functions on both engines
# (get_json_object / json_extract_string — never regex over JSON),
# so nesting, escapes, and key order are handled correctly; invalid
# JSON NULL-absorbs.

_LDJSON_RE = (r"""(?si)<script[^>]*type\s*=\s*["']application/ld\+json["']"""
              r"[^>]*>(.*?)</script>")
#: JSON-LD fields mined per ImageObject block → output column
JSONLD_IMAGE_FIELDS = [
    ("contentUrl", "content_url_raw"),
    ("caption", "caption"),
    ("creditText", "credit"),
    ("license", "license"),
    ("acquireLicensePage", "acquire_license_page"),
    ("creator.name", "creator"),
]


def jsonld_images(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """One row per JSON-LD ImageObject block: (url, block_idx,
    image_url, caption, credit, license, acquire_license_page,
    creator) — image_url is contentUrl (falling back to the `url`
    field) resolved against the page; blocks whose @type is not
    ImageObject, or whose JSON is invalid, or with no image URL at
    all, drop."""
    from dblp_crawler_spark.functions.urlnorm import resolve_url

    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_LDJSON_RE), F.lit(1))
        ).alias("block_idx", "__b"),
    )
    b = F.trim(F.col("__b"))
    typed = blocks.where(
        F.get_json_object(b, "$['@type']") == "ImageObject"
    )
    raw = F.coalesce(
        F.get_json_object(b, "$.contentUrl"),
        F.get_json_object(b, "$.url"),
    )
    from dblp_crawler_spark.functions.urlnorm import resolvable_href

    return typed.where(resolvable_href(raw)).select(
        "url",
        F.col("block_idx").cast("int").alias("block_idx"),
        resolve_url("url", raw).alias("image_url"),
        F.get_json_object(b, "$.caption").alias("caption"),
        F.get_json_object(b, "$.creditText").alias("credit"),
        F.get_json_object(b, "$.license").alias("license"),
        F.get_json_object(b, "$.acquireLicensePage")
        .alias("acquire_license_page"),
        F.get_json_object(b, "$.creator.name").alias("creator"),
    )


def jsonld_images_sql(src: str, url_col: str = "url",
                      html_col: str = "html") -> str:
    """DuckDB replay of :func:`jsonld_images` — same block regex,
    real JSON functions, json_valid guard (DuckDB's extractor errors
    on malformed input where Spark's returns NULL)."""
    from dblp_crawler_spark.functions.urlnorm import (
        resolvable_href_sql,
        resolve_url_sql,
    )

    pat = _LDJSON_RE.replace("'", "''")
    raw = ("COALESCE(json_extract_string(b, '$.contentUrl'),"
           " json_extract_string(b, '$.url'))")
    return f"""
        WITH jl_b AS (
          SELECT {url_col} AS url, t.i - 1 AS block_idx, trim(t.b) AS b
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{pat}', 1)) AS b,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{pat}', 1), 1) AS i) t
        ), jl_v AS (
          SELECT * FROM jl_b WHERE json_valid(b)
            AND json_extract_string(b, '$."@type"') = 'ImageObject'
        ), jl_r AS (
          SELECT url, block_idx, {raw} AS raw, b FROM jl_v
        )
        SELECT url, CAST(block_idx AS INT) AS block_idx,
               {resolve_url_sql('url', 'raw')} AS image_url,
               json_extract_string(b, '$.caption') AS caption,
               json_extract_string(b, '$.creditText') AS credit,
               json_extract_string(b, '$.license') AS license,
               json_extract_string(b, '$.acquireLicensePage')
                 AS acquire_license_page,
               json_extract_string(b, '$.creator.name') AS creator
        FROM jl_r
        WHERE {resolvable_href_sql('raw')}
    """


# ---- structured content extraction (tables, code blocks) --------------------------
#
# Two HTML structures that are TRAINING DATA in their own right, not
# just page text: <table> grids (table-QA / structure-aware corpora
# mine them as (row, col, cell) triples — flattening them into
# running text destroys exactly what makes them valuable) and
# <pre><code> blocks (the code-LLM mining channel; the
# language-<x> class convention carries the label). Both are
# bounded nested block parses — regexp_extract_all + posexplode per
# level, map-side, RE2-safe.

_TABLE_RE = r"(?si)<table[^>]*>.*?</table>"
_TR_RE = r"(?si)<tr[^>]*>.*?</tr>"
_CELL_RE = r"(?si)<t[dh][^>]*>(.*?)</t[dh]>"
_PRE_CODE_RE = r"(?si)<pre[^>]*>\s*<code[^>]*>.*?</code>\s*</pre>"
_CODE_ATTR_RE = r"(?si)<code([^>]*)>"
_CODE_BODY_RE = r"(?si)<code[^>]*>(.*?)</code>"
_LANG_CLASS_RE = r"""language-([a-zA-Z0-9+#-]+)"""

#: entity → literal, applied in order (amp LAST so &amp;lt; stays
#: &lt; — double-escaped entities decode exactly one level)
HTML_ENTITY_TABLE = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&amp;", "&"),
]


def _unescape(col: Column) -> Column:
    for ent, lit in HTML_ENTITY_TABLE:
        col = F.replace(col, F.lit(ent), F.lit(lit))
    return col


def _unescape_sql(expr: str) -> str:
    for ent, lit in HTML_ENTITY_TABLE:
        e = ent.replace("'", "''")
        l = lit.replace("'", "''")
        expr = f"replace({expr}, '{e}', '{l}')"
    return expr


def html_tables(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """One row per table CELL: (url, table_idx, row_idx, col_idx,
    cell, is_header_row) — cell text with inner markup stripped,
    whitespace folded, entities decoded; is_header_row marks rows
    whose cells are <th>. Three nested explodes, no shuffle."""
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), F.lit(0))
        ).alias("table_idx", "__tbl"),
    )
    rows = tables.select(
        "url", "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("__tbl"), F.lit(_TR_RE), F.lit(0))
        ).alias("row_idx", "__row"),
    )
    cells = rows.select(
        "url", "table_idx", "row_idx",
        F.lower(F.col("__row")).rlike("<th[ >]").alias("is_header_row"),
        F.posexplode(
            F.regexp_extract_all(F.col("__row"), F.lit(_CELL_RE), F.lit(1))
        ).alias("col_idx", "__cell"),
    )
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("__cell"), r"<[^>]*>", ""), r"\s+", " "
        )
    )
    return cells.select(
        "url",
        F.col("table_idx").cast("int").alias("table_idx"),
        F.col("row_idx").cast("int").alias("row_idx"),
        F.col("col_idx").cast("int").alias("col_idx"),
        _unescape(text).alias("cell"),
        "is_header_row",
    )


def html_tables_sql(src: str, url_col: str = "url",
                    html_col: str = "html") -> str:
    """DuckDB replay of :func:`html_tables`."""
    def esc(p):
        return p.replace("'", "''")

    text = ("trim(regexp_replace(regexp_replace(cell0, '<[^>]*>', '', 'g'),"
            " '\\s+', ' ', 'g'))")
    return f"""
        WITH ht_t AS (
          SELECT {url_col} AS url, t.i - 1 AS table_idx, t.tbl
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_TABLE_RE)}', 0)) AS tbl,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_TABLE_RE)}', 0), 1) AS i) t
        ), ht_r AS (
          SELECT url, table_idx, r.i - 1 AS row_idx, r.rw
          FROM ht_t,
               LATERAL (SELECT unnest(regexp_extract_all(tbl,
                          '{esc(_TR_RE)}', 0)) AS rw,
                        generate_subscripts(regexp_extract_all(tbl,
                          '{esc(_TR_RE)}', 0), 1) AS i) r
        ), ht_c AS (
          SELECT url, table_idx, row_idx,
                 regexp_matches(lower(rw), '<th[ >]') AS is_header_row,
                 c.i - 1 AS col_idx, c.cell0
          FROM ht_r,
               LATERAL (SELECT unnest(regexp_extract_all(rw,
                          '{esc(_CELL_RE)}', 1)) AS cell0,
                        generate_subscripts(regexp_extract_all(rw,
                          '{esc(_CELL_RE)}', 1), 1) AS i) c
        )
        SELECT url, CAST(table_idx AS INT) AS table_idx,
               CAST(row_idx AS INT) AS row_idx,
               CAST(col_idx AS INT) AS col_idx,
               {_unescape_sql(text)} AS cell,
               is_header_row
        FROM ht_c
    """


def code_blocks(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """One row per <pre><code> block: (url, block_idx, lang, code,
    n_lines) — lang from the language-<x> class convention (NULL
    when unlabeled), code entity-decoded with NEWLINES PRESERVED
    (unlike every prose extractor here — whitespace is syntax)."""
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_PRE_CODE_RE), F.lit(0))
        ).alias("block_idx", "__blk"),
    )
    b = F.col("__blk")
    attrs = F.regexp_extract(b, _CODE_ATTR_RE, 1)
    code = _unescape(F.regexp_extract(b, _CODE_BODY_RE, 1))
    return blocks.select(
        "url",
        F.col("block_idx").cast("int").alias("block_idx"),
        F.nullif(F.regexp_extract(attrs, _LANG_CLASS_RE, 1),
                 F.lit("")).alias("lang"),
        code.alias("code"),
        F.size(F.split(code, "\n")).cast("int").alias("n_lines"),
    )


def code_blocks_sql(src: str, url_col: str = "url",
                    html_col: str = "html") -> str:
    """DuckDB replay of :func:`code_blocks`."""
    def esc(p):
        return p.replace("'", "''")

    code = _unescape_sql(f"regexp_extract(blk, '{esc(_CODE_BODY_RE)}', 1)")
    return f"""
        WITH cb_b AS (
          SELECT {url_col} AS url, t.i - 1 AS block_idx, t.blk
          FROM {src},
               LATERAL (SELECT unnest(regexp_extract_all({html_col},
                          '{esc(_PRE_CODE_RE)}', 0)) AS blk,
                        generate_subscripts(regexp_extract_all({html_col},
                          '{esc(_PRE_CODE_RE)}', 0), 1) AS i) t
        )
        SELECT url, CAST(block_idx AS INT) AS block_idx,
               NULLIF(regexp_extract(regexp_extract(blk,
                 '{esc(_CODE_ATTR_RE)}', 1), '{_LANG_CLASS_RE}', 1), '')
                 AS lang,
               {code} AS code,
               CAST(len(string_split({code}, chr(10))) AS INT) AS n_lines
        FROM cb_b
    """


# ---- podcast enclosures (audio discovery) -----------------------------------------
#
# The audio axis's declared-inventory channel, completing the
# symmetry: images have sitemap_images, video has sitemap_videos +
# HLS, and podcast audio is announced through RSS <enclosure>
# elements — url, MIME type, and a DECLARED byte length (the fetch
# budget knows the cost before scheduling; a declared length that
# later disagrees with Content-Length feeds payload_complete's
# truncation evidence). Attribute order is free; itunes:duration
# ("SS", "MM:SS" or "HH:MM:SS") parses to exact seconds when
# present.

_ENCLOSURE_RE = r"(?si)<enclosure[^>]*>"
_ENC_URL_RE = r"""(?i)[\s]url\s*=\s*["']([^"']*)["']"""
_ENC_TYPE_RE = r"""(?i)[\s]type\s*=\s*["']([^"']*)["']"""
_ENC_LEN_RE = r"""(?i)[\s]length\s*=\s*["'](\d+)["']"""
_IT_DUR_RE = r"(?si)<itunes:duration>\s*([0-9:]+)\s*</itunes:duration>"


def feed_enclosures(pages: DataFrame, xml_col: str = "feed_xml",
                    keep: list | None = None) -> DataFrame:
    """One row per RSS item enclosure: (keep..., item_url,
    enclosure_url, mime, declared_bytes, duration_s, is_audio) —
    item_url from the item's <link> (NULL if absent: enclosures are
    schedulable without one), duration from itunes:duration when
    declared."""
    from ..functions.urlnorm import canonical_url

    cols = keep if keep is not None else [c for c in pages.columns if c != xml_col]
    items = pages.select(
        *cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_RSS_ITEM_RE), F.lit(1))
        ).alias("__item"),
    )
    it = F.col("__item")
    enc = F.regexp_extract(it, _ENCLOSURE_RE, 0)
    dur_raw = F.nullif(F.regexp_extract(it, _IT_DUR_RE, 1), F.lit(""))
    parts = F.split(dur_raw, ":")
    n = F.size(parts)
    dur_s = F.when(
        dur_raw.isNotNull() & (n <= 3),
        F.aggregate(
            parts, F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(60) + x.cast("long"),
        ),
    )
    rows = items.where(enc != "").select(
        *cols,
        canonical_url(
            F.nullif(F.regexp_extract(it, r"(?s)<link>\s*([^<\s]+)", 1),
                     F.lit(""))
        ).alias("item_url"),
        canonical_url(
            F.nullif(F.regexp_extract(enc, _ENC_URL_RE, 1), F.lit(""))
        ).alias("enclosure_url"),
        F.nullif(F.regexp_extract(enc, _ENC_TYPE_RE, 1),
                 F.lit("")).alias("mime"),
        F.nullif(F.regexp_extract(enc, _ENC_LEN_RE, 1), F.lit(""))
        .cast("long").alias("declared_bytes"),
        dur_s.alias("duration_s"),
    )
    return rows.where(F.col("enclosure_url").isNotNull()).withColumn(
        "is_audio",
        F.coalesce(F.col("mime").startswith("audio/"), F.lit(False)),
    )


def feed_enclosures_sql(src: str, xml_col: str = "feed_xml",
                        keep: str = "host") -> str:
    """DuckDB replay of :func:`feed_enclosures`."""
    from ..functions.urlnorm import canonical_url_sql

    def esc(p):
        return p.replace("'", "''")

    link = (f"NULLIF(regexp_extract(item, '(?s)<link>\\s*([^<\\s]+)', 1),"
            f" '')")
    enc_url = (f"NULLIF(regexp_extract(enc, '{esc(_ENC_URL_RE)}', 1), '')")
    dur = f"NULLIF(regexp_extract(item, '{esc(_IT_DUR_RE)}', 1), '')"
    return f"""
        WITH fe_i AS (
          SELECT {keep},
                 unnest(regexp_extract_all({xml_col},
                   '{esc(_RSS_ITEM_RE)}', 1)) AS item
          FROM {src}
        ), fe_e AS (
          SELECT {keep}, item,
                 regexp_extract(item, '{esc(_ENCLOSURE_RE)}', 0) AS enc,
                 {dur} AS dur_raw
          FROM fe_i
        ), fe_r AS (
          SELECT {keep},
                 {canonical_url_sql(link)} AS item_url,
                 {canonical_url_sql(enc_url)} AS enclosure_url,
                 NULLIF(regexp_extract(enc, '{esc(_ENC_TYPE_RE)}', 1), '')
                   AS mime,
                 TRY_CAST(NULLIF(regexp_extract(enc,
                   '{esc(_ENC_LEN_RE)}', 1), '') AS BIGINT)
                   AS declared_bytes,
                 CASE len(string_split(dur_raw, ':'))
                   WHEN 1 THEN TRY_CAST(dur_raw AS BIGINT)
                   WHEN 2 THEN
                     TRY_CAST(string_split(dur_raw, ':')[1] AS BIGINT) * 60
                     + TRY_CAST(string_split(dur_raw, ':')[2] AS BIGINT)
                   WHEN 3 THEN
                     TRY_CAST(string_split(dur_raw, ':')[1] AS BIGINT) * 3600
                     + TRY_CAST(string_split(dur_raw, ':')[2] AS BIGINT) * 60
                     + TRY_CAST(string_split(dur_raw, ':')[3] AS BIGINT)
                 END AS duration_s
          FROM fe_e WHERE enc <> ''
        )
        SELECT {keep}, item_url, enclosure_url, mime, declared_bytes,
               duration_s,
               COALESCE(starts_with(mime, 'audio/'), false) AS is_audio
        FROM fe_r WHERE enclosure_url IS NOT NULL
    """


def table_markdown(cells: DataFrame) -> DataFrame:
    """Render :func:`html_tables` cells to GitHub-markdown — the
    linearization that puts a table into an LLM corpus WITHOUT
    destroying its structure (column alignment survives as | bars,
    the header keeps its separator row). One row per table: (url,
    table_idx, n_rows, n_cols, markdown).

    Scale shape: two ordered aggregations keyed (url, table_idx[,
    row]) — array_sort over collected (idx, text) structs gives the
    deterministic in-row and in-table order on any partitioning; no
    window, no collect. Ragged rows render as-is (markdown is
    forgiving; n_cols reports the MAX so a consumer can gate on
    rectangularity)."""
    pipes = F.regexp_replace(F.col("cell"), r"\|", "\\\\|")
    rows = cells.groupBy("url", "table_idx", "row_idx").agg(
        F.max("is_header_row").alias("__hdr"),
        F.count(F.lit(1)).alias("__ncol"),
        F.concat(
            F.lit("| "),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("col_idx"), pipes.alias("c")))),
                    lambda x: x["c"],
                ),
                " | ",
            ),
            F.lit(" |"),
        ).alias("__line"),
    )
    line = F.when(
        (F.col("row_idx") == 0) & F.col("__hdr"),
        F.concat(
            F.col("__line"), F.lit("\n"),
            F.lit("|"),
            F.repeat(F.lit("---|"), F.col("__ncol").cast("int")),
        ),
    ).otherwise(F.col("__line"))
    return rows.groupBy("url", "table_idx").agg(
        F.count(F.lit(1)).cast("int").alias("n_rows"),
        F.max("__ncol").cast("int").alias("n_cols"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("row_idx"), line.alias("l")))
                ),
                lambda x: x["l"],
            ),
            "\n",
        ).alias("markdown"),
    )


def table_markdown_sql(cells_src: str) -> str:
    """DuckDB replay of :func:`table_markdown` — string_agg with
    ORDER BY at both levels."""
    return f"""
        WITH tm_r AS (
          SELECT url, table_idx, row_idx,
                 MAX(is_header_row) AS hdr,
                 COUNT(*) AS ncol,
                 '| ' || string_agg(regexp_replace(cell, '\\|', '\\\\|', 'g'),
                                    ' | ' ORDER BY col_idx) || ' |' AS line
          FROM {cells_src}
          GROUP BY url, table_idx, row_idx
        ), tm_l AS (
          SELECT url, table_idx, row_idx, ncol,
                 CASE WHEN row_idx = 0 AND hdr
                      THEN line || chr(10) || '|'
                           || repeat('---|', CAST(ncol AS INT))
                      ELSE line END AS line
          FROM tm_r
        )
        SELECT url, table_idx,
               CAST(COUNT(*) AS INT) AS n_rows,
               CAST(MAX(ncol) AS INT) AS n_cols,
               string_agg(line, chr(10) ORDER BY row_idx) AS markdown
        FROM tm_l
        GROUP BY url, table_idx
    """
