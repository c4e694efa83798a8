"""RFC 9309 Allow/Disallow rule evaluation: wildcard patterns,
longest-match precedence, allow-wins-ties — the robots semantics
`robots_status`'s prefix list cannot express. Pins hand-computed
decisions, Spark == DuckDB replay, and Spark == a from-spec Python
reference on randomized rule sets."""

import random
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.operators.scheduler import robots_decide, robots_decide_sql
from dblp_crawler_spark.sources.webparse import (
    parse_robots_rules,
    parse_robots_rules_sql,
)

ROBOTS = {
    # Allow override under a broader Disallow + '$'-anchored wildcard
    "a.org": (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/pub*\n"
        "Disallow: /tmp/*.pdf$\n"
        "Disallow:\n"  # empty value: matches nothing, dropped
    ),
    # '$' anchor vs longer prefix: /a matches both, Disallow longer
    "b.org": "User-agent: *\nDisallow: /a$\nAllow: /a\n",
    # equal-length tie -> Allow wins; pattern not starting with '/'
    "c.org": "User-agent: *\nAllow: /x\nDisallow: /x\nDisallow: *.json$\n",
    # non-star group only: no applicable rules, everything allowed
    "d.org": "User-agent: otherbot\nDisallow: /\n",
    # orphan directive ignored; the star group only Allows
    "e.org": "Disallow: /orphan\nUser-agent: *\nAllow: /only\n",
}


def _rules(spark):
    pages = spark.createDataFrame(
        [(h, t) for h, t in sorted(ROBOTS.items())], "host string, robots_txt string"
    )
    return parse_robots_rules(pages)


def test_parse_robots_rules_keeps_allow_and_drops_empty(spark):
    got = {
        (r.host, r.rule, r.pattern)
        for r in _rules(spark).collect()
    }
    assert got == {
        ("a.org", "disallow", "/private"),
        ("a.org", "allow", "/private/pub*"),
        ("a.org", "disallow", "/tmp/*.pdf$"),
        ("b.org", "disallow", "/a$"),
        ("b.org", "allow", "/a"),
        ("c.org", "allow", "/x"),
        ("c.org", "disallow", "/x"),
        ("c.org", "disallow", "*.json$"),
        ("e.org", "allow", "/only"),
    }


CASES = [
    # (url, allowed, why)
    ("http://a.org/private/file", False, "Disallow /private"),
    ("http://a.org/private/pub42", True, "longer Allow /private/pub* wins"),
    ("http://a.org/tmp/x.pdf", False, "wildcard + $ anchor"),
    ("http://a.org/tmp/x.pdfx", True, "$ anchor: .pdfx does not end in .pdf"),
    ("http://a.org/free", True, "no rule matches"),
    ("http://b.org/a", False, "Disallow /a$ (len 3) beats Allow /a (len 2)"),
    ("http://b.org/ab", True, "only Allow /a matches /ab"),
    ("http://c.org/x/y", True, "equal-length tie -> Allow"),
    ("http://c.org/data/f.json", False, "*.json$ matches anywhere"),
    ("http://d.org/anything", True, "no star group"),
    ("http://e.org/orphan/x", True, "orphan Disallow ignored"),
    ("http://zzz.org/whatever", True, "host without robots"),
    ("http://a.org", True, "bare authority -> path '/'"),
]


def test_robots_decide_pinned_cases(spark):
    urls = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    got = {r.url: r.allowed for r in robots_decide(urls, _rules(spark)).collect()}
    for url, want, why in CASES:
        assert got[url] is want, f"{url}: {why}"


def test_robots_decide_matches_duckdb_replay(spark):
    urls = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    eng = sorted(
        (r.url, r.allowed) for r in robots_decide(urls, _rules(spark)).collect()
    )
    con = duckdb.connect()
    con.register(
        "robots_pages",
        __import__("pandas").DataFrame(
            {"host": list(sorted(ROBOTS)), "robots_txt": [ROBOTS[h] for h in sorted(ROBOTS)]}
        ),
    )
    con.register(
        "cand_urls", __import__("pandas").DataFrame({"url": [u for u, _, _ in CASES]})
    )
    rules_sql = parse_robots_rules_sql("robots_pages").strip()
    decide = robots_decide_sql("cand_urls", "robots_rules").strip()
    assert decide.upper().startswith("WITH")
    q = f"WITH robots_rules AS ({rules_sql}), {decide[len('WITH '):]}"
    ora = sorted((u, bool(a)) for u, a in con.execute(q).fetchall())
    assert eng == ora


def _py_decide(path: str, rules):
    """From-spec reference: longest pattern wins, Allow wins ties."""
    best = None
    for rule, pat in rules:
        ends = pat.endswith("$")
        body = pat[:-1] if ends else pat
        rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if ends else "")
        if re.search(rx, path):
            key = (len(pat), 1 if rule == "allow" else 0)
            best = key if best is None or key > best else best
    return best is None or best[1] == 1


def test_robots_decide_matches_python_reference_randomized(spark):
    rng = random.Random(20260819)
    segs = ["/a", "/b", "/c.d", "*", "/pub"]
    hosts, rule_rows, url_rows, by_host = [], [], [], {}
    for h in range(25):
        host = f"r{h}.org"
        hosts.append(host)
        n = rng.randrange(0, 6)
        rules = []
        for _ in range(n):
            pat = "".join(rng.choice(segs) for _ in range(rng.randrange(1, 4)))
            if rng.random() < 0.3:
                pat += "$"
            rules.append((rng.choice(["allow", "disallow"]), pat))
        rules = sorted(set(rules))
        by_host[host] = rules
        rule_rows += [(host, r, p) for r, p in rules]
        for _ in range(6):
            path = "".join(rng.choice(segs[:3] + ["/pub", "/x"]) for _ in range(rng.randrange(1, 4)))
            url_rows.append((f"http://{host}{path}", host, path))
    rules_df = spark.createDataFrame(rule_rows, "host string, rule string, pattern string")
    urls_df = spark.createDataFrame([(u,) for u, _, _ in url_rows], "url string")
    got = {r.url: r.allowed for r in robots_decide(urls_df, rules_df).collect()}
    for url, host, path in url_rows:
        assert got[url] == _py_decide(path, by_host[host]), (url, by_host[host])


def test_robots_decide_query_string_and_mid_dollar(spark):
    # '$' not at the end is literal; patterns match path?query
    rules = spark.createDataFrame(
        [
            ("q.org", "disallow", "/*?session="),
            ("q.org", "disallow", "/li$teral"),
        ],
        "host string, rule string, pattern string",
    )
    urls = spark.createDataFrame(
        [
            ("http://q.org/page?session=1",),
            ("http://q.org/page?other=1",),
            ("http://q.org/li$teral/x",),
            ("http://q.org/liXteral/x",),
        ],
        "url string",
    )
    got = {r.url: r.allowed for r in robots_decide(urls, rules).collect()}
    assert got["http://q.org/page?session=1"] is False
    assert got["http://q.org/page?other=1"] is True
    assert got["http://q.org/li$teral/x"] is False
    assert got["http://q.org/liXteral/x"] is True
