"""Host-level content pathologies: soft-404 templates and mirror
hosts.

Two crawl-efficiency signals the reference never needs (it crawls
one well-behaved site — ``/root/reference/dblp_crawler/crawler.py``
trusts every 200 response) but a web-scale frontier cannot live
without:

* **Soft 404s** — hosts that answer missing URLs with HTTP 200 and a
  shared "not found" page. Per-URL heuristics can't see them; the
  signal is STRUCTURAL: one content hash dominating a host's 200
  responses. Every page carrying the host's dominant hash (share ≥
  τ, support ≥ min_n) is flagged, so the frontier stops expanding
  links found on error pages and the corpus drops the junk rows.

* **Mirror hosts** — two hosts serving (nearly) the same content
  set. Crawling both wastes the whole budget of one; dedup-at-doc
  level removes the rows but not the fetches. Host-pair containment
  over content hashes (shared / min(|A|, |B|)) finds them from data
  already in the seen-set, BEFORE more fetches are scheduled.

Spark shape: pure aggregations and equi-joins — one (host, hash)
rollup reused by both; the pair join is blocked on content_hash with
a hot-hash cap (a hash served by 10⁴ hosts — empty pages, CDN
boilerplate — would mint 10⁸ pairs; such hashes carry no mirror
evidence and are dropped, the same hapax/hot-key suppression the
minhash band join applies). Share thresholds compare as exact
integer cross-products (count·1000 ≥ τ‰·total) — never a float
divide on the decision path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def soft404_detect(pages: DataFrame, host_col: str = "host",
                   url_col: str = "url", hash_col: str = "content_hash",
                   tau_milli: int = 400, min_n: int = 5) -> DataFrame:
    """Flag pages carrying their host's dominant content hash.

    A hash is the host's soft-404 template when it covers ≥
    ``tau_milli``/1000 of the host's pages AND appears on ≥ ``min_n``
    pages (small hosts can't produce evidence; a 3-page brochure
    site legitimately repeats itself). Returns the input columns
    plus (template_n, host_n, is_soft404); pages of hosts with no
    qualifying template get template_n NULL and is_soft404 false.
    """
    hist = pages.groupBy(host_col, hash_col).agg(F.count("*").alias("template_n"))
    totals = hist.groupBy(host_col).agg(F.sum("template_n").alias("host_n"))
    templates = (
        hist.join(totals, host_col)
        .where((F.col("template_n") >= min_n)
               & (F.col("template_n") * 1000 >= F.lit(tau_milli) * F.col("host_n")))
    )
    out = pages.join(templates, [host_col, hash_col], "left")
    return out.withColumn("is_soft404", F.col("template_n").isNotNull())


def soft404_detect_sql(src: str, host_col: str = "host",
                       url_col: str = "url", hash_col: str = "content_hash",
                       tau_milli: int = 400, min_n: int = 5) -> str:
    """DuckDB replay of :func:`soft404_detect`."""
    return f"""
        WITH s4_hist AS (
          SELECT {host_col}, {hash_col}, COUNT(*) AS template_n
          FROM {src} GROUP BY {host_col}, {hash_col}
        ), s4_tot AS (
          SELECT {host_col}, CAST(SUM(template_n) AS BIGINT) AS host_n
          FROM s4_hist GROUP BY {host_col}
        ), s4_tpl AS (
          SELECT h.{host_col}, h.{hash_col}, h.template_n, t.host_n
          FROM s4_hist h JOIN s4_tot t USING ({host_col})
          WHERE h.template_n >= {min_n}
            AND h.template_n * 1000 >= {tau_milli} * t.host_n
        )
        SELECT p.*, s.template_n, s.host_n,
               s.template_n IS NOT NULL AS is_soft404
        FROM {src} p LEFT JOIN s4_tpl s
          ON p.{host_col} = s.{host_col} AND p.{hash_col} = s.{hash_col}
    """


def mirror_host_pairs(pages: DataFrame, host_col: str = "host",
                      hash_col: str = "content_hash",
                      tau_milli: int = 800, min_shared: int = 3,
                      max_hosts_per_hash: int = 16) -> DataFrame:
    """Host pairs whose content-hash sets overlap enough to be
    mirrors: containment = shared / min(|A|, |B|) ≥ ``tau_milli``/1000
    with at least ``min_shared`` shared hashes.

    Candidate pairs come from a self-equi-join of the DISTINCT
    (host, hash) set on hash — the blocked-join shape, never
    all-pairs-of-hosts. Hashes present on more than
    ``max_hosts_per_hash`` hosts are dropped BEFORE the join (they
    are boilerplate, not mirror evidence, and they alone create the
    quadratic blow-up). Output: (host_a, host_b, shared, n_a, n_b,
    containment, jaccard) with host_a < host_b, containment/jaccard
    rounded to 4 — ordering-free and engine-portable.
    """
    hh = pages.select(host_col, hash_col).distinct()
    sizes = hh.groupBy(host_col).agg(F.count("*").alias("n"))
    spread = hh.groupBy(hash_col).agg(F.count("*").alias("n_hosts"))
    narrow = hh.join(
        spread.where(F.col("n_hosts") <= max_hosts_per_hash), hash_col
    ).select(host_col, hash_col)
    a = narrow.select(F.col(host_col).alias("host_a"), F.col(hash_col).alias("__h"))
    b = narrow.select(F.col(host_col).alias("host_b"), F.col(hash_col).alias("__h"))
    shared = (
        a.join(b, "__h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.select(F.col(host_col).alias("host_a"),
                                 F.col("n").alias("n_a")), "host_a")
        .join(sizes.select(F.col(host_col).alias("host_b"),
                           F.col("n").alias("n_b")), "host_b")
        .where((F.col("shared") >= min_shared)
               & (F.col("shared") * 1000
                  >= F.lit(tau_milli) * F.least("n_a", "n_b")))
    )
    return out.select(
        "host_a", "host_b", "shared", "n_a", "n_b",
        F.round(F.col("shared") / F.least("n_a", "n_b"), 4).alias("containment"),
        F.round(F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                4).alias("jaccard"),
    )


def mirror_host_pairs_sql(src: str, host_col: str = "host",
                          hash_col: str = "content_hash",
                          tau_milli: int = 800, min_shared: int = 3,
                          max_hosts_per_hash: int = 16) -> str:
    """DuckDB replay of :func:`mirror_host_pairs`."""
    return f"""
        WITH mh_hh AS (
          SELECT DISTINCT {host_col} AS host, {hash_col} AS h FROM {src}
        ), mh_sizes AS (
          SELECT host, COUNT(*) AS n FROM mh_hh GROUP BY host
        ), mh_narrow AS (
          SELECT host, h FROM mh_hh
          WHERE h IN (SELECT h FROM mh_hh GROUP BY h
                      HAVING COUNT(*) <= {max_hosts_per_hash})
        ), mh_shared AS (
          SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
          FROM mh_narrow a JOIN mh_narrow b ON a.h = b.h AND a.host < b.host
          GROUP BY a.host, b.host
        )
        SELECT s.host_a, s.host_b, s.shared, sa.n AS n_a, sb.n AS n_b,
               ROUND(s.shared / LEAST(sa.n, sb.n), 4) AS containment,
               ROUND(s.shared / (sa.n + sb.n - s.shared), 4) AS jaccard
        FROM mh_shared s
        JOIN mh_sizes sa ON sa.host = s.host_a
        JOIN mh_sizes sb ON sb.host = s.host_b
        WHERE s.shared >= {min_shared}
          AND s.shared * 1000 >= {tau_milli} * LEAST(sa.n, sb.n)
    """


def host_language_profile(pages: DataFrame, host_col: str = "host",
                          lang_col: str = "lang") -> DataFrame:
    """Per-host language mix: (host, n_pages, n_langs, dominant_lang,
    dominant_share, lang_entropy) — the multilingual spam signal a
    per-doc language ID misses. A legitimate site is monolingual or
    cleanly split; a host mixing many languages across thin pages is
    the classic keyword-stuffing / scraped-content farm shape, and a
    claimed-locale host dominated by another language routes to the
    wrong corpus.

    One (host, lang) rollup feeds everything; the dominant language
    is elected with a deterministic tie-break (highest count, then
    lexicographically first) via a host-keyed window sharing the
    rollup's exchange; entropy is Shannon bits over the language
    distribution, rounded to 4 (both engines compute the identical
    double expression)."""
    from pyspark.sql import Window

    hist = pages.groupBy(host_col, lang_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(host_col).orderBy(F.desc("n"), F.asc(lang_col))
    tot = Window.partitionBy(host_col)
    enriched = (
        hist.withColumn("__rn", F.row_number().over(w))
        .withColumn("__total", F.sum("n").over(tot))
    )
    p = F.col("n") / F.col("__total")
    return (
        enriched.groupBy(host_col)
        .agg(
            F.max("__total").alias("n_pages"),
            F.count("*").alias("n_langs"),
            F.max(F.when(F.col("__rn") == 1, F.col(lang_col))).alias("dominant_lang"),
            F.round(F.max(F.when(F.col("__rn") == 1, p)), 4).alias("dominant_share"),
            F.round(F.sum(-p * F.log2(p)), 4).alias("lang_entropy"),
        )
    )


def host_language_profile_sql(src: str, host_col: str = "host",
                              lang_col: str = "lang") -> str:
    """DuckDB replay of :func:`host_language_profile`."""
    return f"""
        WITH hl_hist AS (
          SELECT {host_col} AS host, {lang_col} AS lang, COUNT(*) AS n
          FROM {src} GROUP BY 1, 2
        ), hl_e AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY host
                   ORDER BY n DESC, lang) AS rn,
                 SUM(n) OVER (PARTITION BY host) AS total
          FROM hl_hist
        )
        SELECT host, CAST(MAX(total) AS BIGINT) AS n_pages,
               COUNT(*) AS n_langs,
               MAX(CASE WHEN rn = 1 THEN lang END) AS dominant_lang,
               ROUND(MAX(CASE WHEN rn = 1 THEN n / total END), 4)
                 AS dominant_share,
               ROUND(SUM(-(n / total) * log2(n / total)), 4) AS lang_entropy
        FROM hl_e GROUP BY host
    """


# ---- IDN homograph / confusable hosts ------------------------------------------
#
# The phishing-shape host pathology: a domain spelled with Cyrillic/
# Greek letters (or 0/1 digit stand-ins) that renders pixel-identical
# to a Latin brand domain.  A frontier that treats these as ordinary
# new hosts hands them crawl budget and lets their content pollute
# the corpus under a trusted-looking name; the defense is a
# confusable SKELETON (Unicode TR39's idea, reduced to the
# high-traffic confusable set): map every confusable to its Latin
# target and collide hosts whose skeletons agree.  translate() is
# codepoint-for-codepoint in both engines, so the skeleton — and the
# oracle — cannot drift.

#: visually-identical (Cyrillic/Greek → Latin) + digit confusables.
#: Codepoint pairs; extend freely — the pair detector keys on the
#: mapping's OUTPUT, not the table size.
CONFUSABLE_FROM = "асеорхуіјѕԛԝ" + "ον" + "01"
CONFUSABLE_TO = "aceopxyijsqw" + "ov" + "ol"

#: script-property names shared by the engine (Java spells \p{IsX})
#: and the replay (RE2 spells \p{X}) — same discipline as
#: textstats.SCRIPT_TABLE.
_HOMOGRAPH_SCRIPTS = ("Cyrillic", "Greek")


def idn_homograph(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Per-host confusable flags: (host, ascii_only, has_punycode,
    mixed_script, skeleton).

    ascii_only is byte-length == char-length (engine-portable, no
    codepoint table); has_punycode marks any xn-- label (IDN is
    legitimate — the flag routes the host to punycode-aware
    handling, it is NOT an accusation); mixed_script is the TR39
    red flag proper: Latin letters AND Cyrillic/Greek letters inside
    one host label set — no legitimate registry allows that mix.
    Pure projection over the distinct host set."""
    h = F.lower(F.col(host_col))
    cyr_greek = "[" + "".join(
        rf"\p{{Is{s}}}" for s in _HOMOGRAPH_SCRIPTS) + "]"
    return hosts.select(h.alias("host")).distinct().select(
        "host",
        (F.octet_length("host") == F.length("host")).alias("ascii_only"),
        F.col("host").rlike(r"(^|\.)xn--").alias("has_punycode"),
        (F.col("host").rlike(r"\p{IsLatin}")
         & F.col("host").rlike(cyr_greek)).alias("mixed_script"),
        F.translate("host", CONFUSABLE_FROM, CONFUSABLE_TO).alias("skeleton"),
    )


def idn_homograph_sql(src: str, host_col: str = "host") -> str:
    """DuckDB replay of :func:`idn_homograph` — RE2 script spelling,
    strlen (bytes) vs length (chars) for ascii_only."""
    cyr_greek = "[" + "".join(
        f"\\p{{{s}}}" for s in _HOMOGRAPH_SCRIPTS) + "]"
    return f"""
        WITH ih_h AS (
          SELECT DISTINCT lower({host_col}) AS host FROM {src}
        )
        SELECT host,
               strlen(host) = length(host) AS ascii_only,
               regexp_matches(host, '(^|\\.)xn--') AS has_punycode,
               regexp_matches(host, '\\p{{Latin}}')
                 AND regexp_matches(host, '{cyr_greek}') AS mixed_script,
               translate(host, '{CONFUSABLE_FROM}', '{CONFUSABLE_TO}') AS skeleton
        FROM ih_h
    """


def homograph_pairs(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(skeleton, imposter, target) pairs: an IMPOSTER is a host the
    confusable map changed (skeleton ≠ host — it contains stand-in
    codepoints); a TARGET is a host the map fixed (skeleton = host —
    the authentic Latin spelling).  An imposter colliding with a
    registered target is the homograph-attack signature; one
    equi-join on skeleton (never all-pairs — the skeleton is the
    block key, exactly the minhash-band discipline)."""
    per = idn_homograph(hosts, host_col=host_col)
    imposters = per.filter(F.col("skeleton") != F.col("host")) \
                   .select("skeleton", F.col("host").alias("imposter"))
    targets = per.filter(F.col("skeleton") == F.col("host")) \
                 .select("skeleton", F.col("host").alias("target"))
    return imposters.join(targets, "skeleton")


def homograph_pairs_sql(src: str, host_col: str = "host") -> str:
    """DuckDB replay of :func:`homograph_pairs`."""
    return f"""
        WITH hp_per AS ({idn_homograph_sql(src, host_col=host_col)})
        SELECT i.skeleton, i.host AS imposter, t.host AS target
        FROM hp_per i JOIN hp_per t ON t.skeleton = i.skeleton
        WHERE i.skeleton <> i.host AND t.skeleton = t.host
    """


def cloaking_detect(fetches: DataFrame, host_col: str = "host",
                    url_col: str = "url", ua_col: str = "ua_class",
                    hash_col: str = "content_hash",
                    tau_milli: int = 300, min_paired: int = 3) -> DataFrame:
    """Per-host cloaking signal: does the host serve crawler
    user-agents DIFFERENT content than browser user-agents?

    Cloaked hosts (SEO spam showing bots keyword farms, bot-walls
    showing bots interstitials) poison a corpus invisibly — every
    per-page quality check sees only the crawler's copy. The signal
    needs probe fetches under both UA classes; given a fetch log with
    a `ua_col` of 'crawler'/'browser' (other labels ignored), a URL
    fetched under both is a PAIRED probe and a pair with differing
    content hashes is DIVERGENT. A host cloaks when ≥
    ``tau_milli``/1000 of ≥ ``min_paired`` paired probes diverge
    (exact integer cross-multiply — a 2-URL host can't produce
    evidence).

    Refetches under one UA collapse to the MIN hash (deterministic;
    hosts with per-request dynamic content need a template-normalized
    hash upstream — the soft404 family's hash works). Plan: one
    (host,url) hash agg with conditional mins folding the UA pivot
    into the same shuffle, then a per-host rollup — two exchanges
    total, no joins. Returns (host, n_paired, n_divergent,
    cloaking)."""
    ua = F.col(ua_col)
    pairs = (
        fetches.groupBy(host_col, url_col)
        .agg(
            F.min(F.when(ua == "crawler", F.col(hash_col))).alias("__ch"),
            F.min(F.when(ua == "browser", F.col(hash_col))).alias("__bh"),
        )
        .withColumn("__paired", F.col("__ch").isNotNull() & F.col("__bh").isNotNull())
        .withColumn("__div", F.col("__paired") & (F.col("__ch") != F.col("__bh")))
    )
    return (
        pairs.groupBy(host_col)
        .agg(
            F.sum(F.col("__paired").cast("long")).alias("n_paired"),
            F.sum(F.col("__div").cast("long")).alias("n_divergent"),
        )
        .withColumn(
            "cloaking",
            (F.col("n_paired") >= min_paired)
            & (F.col("n_divergent") * 1000 >= F.lit(tau_milli) * F.col("n_paired")),
        )
    )


def cloaking_detect_sql(src: str, host_col: str = "host",
                        url_col: str = "url", ua_col: str = "ua_class",
                        hash_col: str = "content_hash",
                        tau_milli: int = 300, min_paired: int = 3) -> str:
    """DuckDB replay of :func:`cloaking_detect` — same conditional-min
    pivot, same integer thresholds."""
    return f"""
        WITH cd_pairs AS (
          SELECT {host_col}, {url_col},
                 MIN(CASE WHEN {ua_col} = 'crawler' THEN {hash_col} END) AS ch,
                 MIN(CASE WHEN {ua_col} = 'browser' THEN {hash_col} END) AS bh
          FROM {src} GROUP BY {host_col}, {url_col}
        ), cd_flag AS (
          SELECT {host_col},
                 ch IS NOT NULL AND bh IS NOT NULL AS paired,
                 ch IS NOT NULL AND bh IS NOT NULL AND ch <> bh AS div
          FROM cd_pairs
        )
        SELECT {host_col},
               CAST(SUM(CASE WHEN paired THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
               CAST(SUM(CASE WHEN div THEN 1 ELSE 0 END) AS BIGINT) AS n_divergent,
               SUM(CASE WHEN paired THEN 1 ELSE 0 END) >= {min_paired}
                 AND SUM(CASE WHEN div THEN 1 ELSE 0 END) * 1000
                     >= {tau_milli} * SUM(CASE WHEN paired THEN 1 ELSE 0 END)
               AS cloaking
        FROM cd_flag GROUP BY {host_col}
    """


def host_scorecard(fetch_probes: DataFrame, pages: DataFrame,
                   payloads: DataFrame,
                   flag_milli: int = 500) -> DataFrame:
    """The per-host reputation rollup a frontier consults before
    granting budget: three independent pathology signals — UA
    cloaking (probe divergence), soft-404 templates (one hash
    dominating the host's 200s) and payload truncation (fetches that
    never finish) — folded into ONE transparent integer score per
    host. Each signal is the already-oracled operator; this is their
    integration statement.

    Inputs: ``fetch_probes`` (host, url, ua_class, content_hash) for
    :func:`cloaking_detect`; ``pages`` (host, url, content_hash) for
    :func:`soft404_detect`; ``payloads`` (host, bytes) for
    payload_complete. Output per host: cloaking, soft404_milli
    (template-page share), truncated_milli (share of
    trailer-evidenced payloads that are cut — no-evidence formats
    never count), and score = 400·cloaking + soft404_milli +
    truncated_milli with ``flagged`` at ≥ ``flag_milli``. All exact
    integer arithmetic; three host-keyed rollups + two equi-joins."""
    from .sniff import payload_complete

    cl = cloaking_detect(fetch_probes).select("host", "cloaking")
    s4 = (
        soft404_detect(pages)
        .groupBy("host")
        .agg(
            F.sum(F.col("is_soft404").cast("long")).alias("__s"),
            F.count("*").alias("__n"),
        )
        .select("host",
                F.expr("CAST(__s * 1000 DIV __n AS BIGINT)")
                .alias("soft404_milli"))
    )
    pc = (
        payload_complete(payloads)
        .groupBy("host")
        .agg(
            F.sum(F.col("truncated").cast("long")).alias("__tr"),
            F.count("trailer_ok").alias("__ev"),
        )
        .select(
            "host",
            F.when(F.col("__ev") > 0,
                   F.expr("CAST(__tr * 1000 DIV __ev AS BIGINT)"))
            .otherwise(F.lit(0).cast("long")).alias("truncated_milli"),
        )
    )
    out = cl.join(s4, "host", "full").join(pc, "host", "full")
    score = (
        F.coalesce(F.col("cloaking").cast("long"), F.lit(0)) * 400
        + F.coalesce(F.col("soft404_milli"), F.lit(0))
        + F.coalesce(F.col("truncated_milli"), F.lit(0))
    )
    return out.select(
        "host",
        F.coalesce(F.col("cloaking"), F.lit(False)).alias("cloaking"),
        F.coalesce(F.col("soft404_milli"), F.lit(0).cast("long"))
        .alias("soft404_milli"),
        F.coalesce(F.col("truncated_milli"), F.lit(0).cast("long"))
        .alias("truncated_milli"),
        score.alias("score"),
        (score >= flag_milli).alias("flagged"),
    )


def host_scorecard_sql(probe_src: str, page_src: str, payload_src: str,
                       flag_milli: int = 500) -> str:
    """DuckDB replay of :func:`host_scorecard` — chains the
    cloaking_detect / soft404_detect / payload_complete replays and
    the same integer fold. ``payload_src`` must expose (host, h) with
    h the full payload hex; its fmt is regenerated from the shared
    MAGIC_TABLE."""
    from .sniff import payload_complete_sql, sniff_case_sql

    staged_payload = (f"(SELECT host, h, {sniff_case_sql('h')} AS fmt "
                      f"FROM {payload_src})")
    return f"""
        WITH hs_cl AS (
          SELECT host, cloaking FROM ({cloaking_detect_sql(probe_src)})
        ), hs_s4 AS (
          SELECT host,
                 CAST(SUM(CASE WHEN is_soft404 THEN 1 ELSE 0 END) * 1000
                      // COUNT(*) AS BIGINT) AS soft404_milli
          FROM ({soft404_detect_sql(page_src)}) GROUP BY host
        ), hs_pc AS (
          SELECT host,
                 CASE WHEN COUNT(trailer_ok) > 0 THEN
                   CAST(SUM(CASE WHEN truncated THEN 1 ELSE 0 END) * 1000
                        // COUNT(trailer_ok) AS BIGINT)
                 ELSE 0 END AS truncated_milli
          FROM ({payload_complete_sql(staged_payload, keep="host")})
          GROUP BY host
        ), hs_j AS (
          SELECT COALESCE(c.host, s.host, p.host) AS host,
                 COALESCE(c.cloaking, false) AS cloaking,
                 COALESCE(s.soft404_milli, 0) AS soft404_milli,
                 COALESCE(p.truncated_milli, 0) AS truncated_milli
          FROM hs_cl c
          FULL JOIN hs_s4 s ON c.host = s.host
          FULL JOIN hs_pc p ON COALESCE(c.host, s.host) = p.host
        )
        SELECT host, cloaking, soft404_milli, truncated_milli,
               CAST(CASE WHEN cloaking THEN 400 ELSE 0 END
                    + soft404_milli + truncated_milli AS BIGINT) AS score,
               (CASE WHEN cloaking THEN 400 ELSE 0 END
                    + soft404_milli + truncated_milli) >= {flag_milli}
                 AS flagged
        FROM hs_j
    """


# ---- scheme / www variant preference ----------------------------------------
#
# Most sites serve the same page at up to four spellings (http/https
# × www/bare). Content-hash election (canonical_election) catches
# them AFTER fetching all four; this operator collapses them
# DECLARATIVELY, before a byte is fetched, by the convention
# browsers and search engines settled on: prefer https over http and
# the bare host over www. — rank = https*2 + bare*1, ties (same
# rank, distinct URLs can only differ beyond the variant key) break
# on the lexicographically smallest URL. Runs on canonicalized URLs
# (canonical_url upstream — casing/ports already normalized). One
# window over the variant key + one key join back; the variant key
# strips scheme and a single leading 'www.' label.

def variant_preference(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, preferred_url, is_alias) per distinct URL: all observed
    scheme/www variants of the same host+path group under one key;
    the highest-preference spelling is elected, the rest are aliases
    a frontier should rewrite to it."""
    from pyspark.sql import Window

    u = F.col("url")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    ranked = urls.select(F.col(url_col).alias("url")).distinct().select(
        "url",
        F.regexp_replace(rest, r"^www\.", "").alias("vkey"),
        ((scheme == "https").cast("int") * 2
         + (~rest.startswith("www.")).cast("int")).alias("rank"),
    )
    w = Window.partitionBy("vkey").orderBy(F.desc("rank"), F.asc("url"))
    pref = (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vkey", F.col("url").alias("preferred_url"))
    )
    return ranked.join(pref, "vkey").select(
        "url", "preferred_url",
        (F.col("url") != F.col("preferred_url")).alias("is_alias"),
    )


def variant_preference_sql(src: str, url_col: str = "url") -> str:
    """DuckDB replay of :func:`variant_preference` — same key, rank,
    and window election."""
    return f"""
        WITH vp_b AS (
          SELECT DISTINCT {url_col} AS url FROM {src}
        ), vp_k AS (
          SELECT url,
                 lower(regexp_extract(url,
                       '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                 regexp_replace(url,
                       '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
          FROM vp_b
        ), vp_r AS (
          SELECT url, regexp_replace(rest, '^www\\.', '') AS vkey,
                 CASE WHEN scheme = 'https' THEN 2 ELSE 0 END
                 + CASE WHEN rest LIKE 'www.%' THEN 0 ELSE 1 END AS rank
          FROM vp_k
        ), vp_p AS (
          SELECT vkey, url AS preferred_url FROM (
            SELECT vkey, url,
                   ROW_NUMBER() OVER (PARTITION BY vkey
                                      ORDER BY rank DESC, url) AS rn
            FROM vp_r
          ) WHERE rn = 1
        )
        SELECT r.url, p.preferred_url, r.url <> p.preferred_url AS is_alias
        FROM vp_r r JOIN vp_p p USING (vkey)
    """


# ---- DNS churn / fast-flux detection -----------------------------------------
#
# Spam and malware infrastructure rotates a hostname across large
# botnet IP pools with tiny TTLs (fast flux); legitimate hosts sit
# on a handful of stable addresses (round-robin and CDNs rotate
# WITHIN a small set). The resolution log the crawler already keeps
# for ip_politeness yields the signal for free: distinct-IP count
# vs observation window. The flag cross-multiplies (new IPs per day
# > churn threshold) so no float decides; a host observed at one
# instant (span 0) flags only via the raw IP count. One hash agg.

def dns_churn(dns_log: DataFrame, min_ips: int = 5, per_day: int = 3,
              host_col: str = "host", ip_col: str = "ip",
              ts_col: str = "ts_us") -> DataFrame:
    """(host, n_obs, n_ips, span_s, fast_flux) per host over a
    (host, ip, ts_us) resolution log: fast_flux when the host showed
    >= min_ips distinct IPs AND gained more than `per_day` new IPs
    per observed day (span-0 hosts: the IP count alone decides)."""
    g = dns_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count_distinct(F.col(ip_col)).alias("n_ips"),
        # floor-div, not float-div: DuckDB's double->BIGINT cast ROUNDS
        # where Spark's truncates — floor on both sides is the parity
        F.floor((F.max(ts_col) - F.min(ts_col)) / F.lit(1_000_000))
        .cast("long").alias("span_s"),
    )
    churny = (F.col("n_ips") - 1) * 86400 > F.lit(per_day) * F.col("span_s")
    return g.withColumn(
        "fast_flux",
        (F.col("n_ips") >= min_ips)
        & (F.when(F.col("span_s") == 0, F.lit(True)).otherwise(churny)),
    )


def dns_churn_sql(src: str, min_ips: int = 5, per_day: int = 3,
                  host_col: str = "host", ip_col: str = "ip",
                  ts_col: str = "ts_us") -> str:
    """DuckDB replay of :func:`dns_churn` — same integer churn
    cross-multiplication."""
    return f"""
        WITH dc_g AS (
          SELECT {host_col} AS host, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 CAST(COUNT(DISTINCT {ip_col}) AS BIGINT) AS n_ips,
                 CAST(floor((MAX({ts_col}) - MIN({ts_col})) / 1000000)
                      AS BIGINT) AS span_s
          FROM {src} GROUP BY {host_col}
        )
        SELECT *, n_ips >= {min_ips} AND (CASE WHEN span_s = 0 THEN TRUE
                   ELSE (n_ips - 1) * 86400 > {per_day} * span_s END)
               AS fast_flux
        FROM dc_g
    """
