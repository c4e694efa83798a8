"""URL canonicalization: fixed expected spellings + cross-engine
(Spark vs DuckDB fragment) equality on an adversarial battery.

north_rule: "each iteration canonicalizes and hashes candidate
URLs" — two raw spellings of one resource must map to ONE seen-set
key, or the frontier double-fetches.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from dblp_crawler_spark.functions.urlnorm import (
    canonical_url,
    canonical_url_sql,
    url_host,
)

# (raw, expected-canonical)
CASES = [
    # scheme+host case folding
    ("HTTP://Example.ORG/Path", "http://example.org/Path"),
    # default ports stripped, only for the matching scheme
    ("http://example.org:80/a", "http://example.org/a"),
    ("https://example.org:443/a", "https://example.org/a"),
    ("http://example.org:8080/a", "http://example.org:8080/a"),
    ("https://example.org:80/a", "https://example.org:80/a"),
    # fragment dropped
    ("http://example.org/a#sec-2", "http://example.org/a"),
    ("http://example.org/a?x=1#f", "http://example.org/a?x=1"),
    # query param sort + empty-param drop
    ("http://e.org/p?b=2&a=1", "http://e.org/p?a=1&b=2"),
    ("http://e.org/p?b=2&&a=1&", "http://e.org/p?a=1&b=2"),
    ("http://e.org/p?", "http://e.org/p"),
    # trailing slashes collapse; bare authority gets '/'
    ("http://example.org", "http://example.org/"),
    ("http://example.org/", "http://example.org/"),
    ("http://example.org/a/", "http://example.org/a"),
    ("http://example.org/a///", "http://example.org/a"),
    # query on bare authority
    ("http://example.org?z=1&y=2", "http://example.org/?y=2&z=1"),
    # whitespace trim
    ("  http://example.org/a \t", "http://example.org/a"),
    # path case is PRESERVED (only scheme/host fold)
    ("https://E.org/CamelCase?Q=V", "https://e.org/CamelCase?Q=V"),
    # non-http(s) scheme: no port stripping
    ("ftp://Host.Org:80/f", "ftp://host.org:80/f"),
    # no scheme: trimmed + fragment-stripped, otherwise untouched
    ("  /relative/path#x", "/relative/path"),
    ("dangling.html", "dangling.html"),
]


def test_canonical_url_expected_spellings(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    for raw, want in CASES:
        assert got[raw.strip() if False else raw] == want, raw


def test_canonical_url_matches_duckdb_fragment(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    con = duckdb.connect()
    for raw, _ in CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        (duck,) = con.sql(f"SELECT {canonical_url_sql(lit)}").fetchone()
        assert duck == got[raw], raw


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the frontier may
    re-canonicalize already-normalized URLs freely."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    out = df.select(
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    )
    assert out.filter(F.col("c1") != F.col("c2")).count() == 0


def test_url_host_extracts_budget_key(spark):
    df = spark.createDataFrame(
        [("HTTP://DBLP.org:80/pid/x?a=1#f",), ("/rel/x",)], "url string"
    )
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["dblp.org:80", ""]


def test_canonical_url_is_pure_projection(spark):
    """Plan shape: no exchange, no Python eval — a single projected
    scan that whole-stage codegen can fuse."""
    df = spark.range(100).select(
        F.format_string("http://h%d.org/p?b=2&a=1", F.col("id") % 7).alias("url")
    )
    plan = df.select(canonical_url("url").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---- property: random structured URLs, three-way agreement ------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_seg = st.text(alphabet="abcXYZ059._-~%", min_size=1, max_size=6)
_host_word = st.text(alphabet="abcDEF01-", min_size=1, max_size=8)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]))
    host = ".".join(draw(st.lists(_host_word, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "".join("/" + draw(_seg) for _ in range(draw(st.integers(0, 4))))
    path += draw(st.sampled_from(["", "/", "//"]))
    params = draw(st.lists(
        st.tuples(st.text(alphabet="abz0", min_size=1, max_size=3),
                  st.text(alphabet="xy19", min_size=0, max_size=3)),
        max_size=4,
    ))
    query = "&".join(f"{k}={v}" for k, v in params)
    query = draw(st.sampled_from(["", "?"])) if not query else "?" + query
    frag = draw(st.sampled_from(["", "#f", "#a/b?c"]))
    pad = draw(st.sampled_from(["", " ", "\t"]))
    return f"{pad}{scheme}://{host}{port}{path}{query}{frag}{pad}"


def _py_canonical(u: str) -> str:
    """Pure-Python model of canonical_url (the third vote)."""
    import re

    u = re.sub(r"\s+$", "", re.sub(r"^\s+", "", u))
    u = re.sub(r"#.*$", "", u, flags=re.S)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    if not m:
        return u
    scheme = m.group(1).lower()
    rest = u[m.end():]
    hp = re.match(r"^([^/?]*)", rest).group(1).lower()
    host = hp
    if scheme == "http" and hp.endswith(":80"):
        host = hp[:-3]
    elif scheme == "https" and hp.endswith(":443"):
        host = hp[:-4]
    pathq = rest[len(hp):]
    rawpath = re.match(r"^([^?]*)", pathq).group(1)
    path = re.sub(r"/+$", "", rawpath) or "/"
    query = re.sub(r"^[^?]*\?", "", pathq) if "?" in pathq else ""
    parts = sorted(p for p in query.split("&") if p != "")
    qn = "&".join(parts)
    return f"{scheme}://{host}{path}" + (f"?{qn}" if qn else "")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_urls(), min_size=1, max_size=40, unique=True))
def test_canonical_url_three_way_property(spark, urls):
    """Random structured URLs: Spark expression chain, DuckDB
    fragment, and an independent Python model must agree exactly,
    and the result must be a fixed point."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonical_url("url").alias("c"),
        canonical_url(canonical_url("url")).alias("cc"),
    ).collect()
    con = duckdb.connect()
    for r in rows:
        assert r["c"] == _py_canonical(r["url"]), r["url"]
        assert r["cc"] == r["c"], r["url"]
        lit = "'" + r["url"].replace("'", "''") + "'"
        (duck,) = con.sql(f"SELECT {canonical_url_sql(lit)}").fetchone()
        assert duck == r["c"], r["url"]


# ---- spider-trap heuristics --------------------------------------------------
TRAP_CASES = [
    ("http://h.org/a/b?x=1", dict(depth=2, is_trap=False)),
    ("http://h.org/" + "/".join(f"p{i}" for i in range(10)),
     dict(depth=10, deep_path=True, is_trap=True)),
    ("http://h.org/cat/page/cat/page/cat",
     dict(repeated_segments=True, is_trap=True)),
    ("http://h.org/a/b/a", dict(repeated_segments=False, is_trap=False)),  # 1 dup only
    ("http://h.org/a?PHPSESSID=abc&x=1", dict(session_param=True, is_trap=True)),
    ("http://h.org/a?version=2", dict(session_param=False, is_trap=False)),  # no substring FP
    ("http://h.org/2020/01/2020/02/x", dict(calendar_loop=True, is_trap=True)),
    ("http://h.org/2020/01/x", dict(calendar_loop=False, is_trap=False)),
]


def test_url_trap_flags_semantics(spark):
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags

    df = spark.createDataFrame([(u,) for u, _ in TRAP_CASES], "url string")
    got = {r["url"]: r["t"].asDict() for r in
           df.select("url", url_trap_flags("url").alias("t")).collect()}
    for u, want in TRAP_CASES:
        for k, v in want.items():
            assert got[u][k] == v, (u, k, got[u])


def test_url_trap_flags_matches_duckdb(spark):
    from dblp_crawler_spark.functions.urlnorm import url_trap_flags, url_trap_flags_sql

    df = spark.createDataFrame([(u,) for u, _ in TRAP_CASES], "url string")
    got = {r["url"]: r["t"].asDict() for r in
           df.select("url", url_trap_flags("url").alias("t")).collect()}
    con = duckdb.connect()
    for u, _ in TRAP_CASES:
        lit = "'" + u.replace("'", "''") + "'"
        frags = url_trap_flags_sql(lit)
        sel = ", ".join(f"{sql} AS {name}" for name, sql in frags.items())
        row = con.sql(f"SELECT {sel}").df().iloc[0].to_dict()
        for k in frags:
            assert bool(row[k]) == bool(got[u][k]) if k != "depth" else row[k] == got[u][k], (u, k)


# ---- composed frontier admission ---------------------------------------------
def test_admit_candidates_composition(spark):
    """Raw spellings collapse to one admitted row; traps never enter;
    already-seen keys are excluded; host is the politeness key."""
    from dblp_crawler_spark.functions.hashing import hash60
    from dblp_crawler_spark.operators.frontier import admit_candidates

    cands = spark.createDataFrame(
        [
            ("HTTP://A.org:80/x/?b=2&a=1",),   # alias 1
            ("http://a.org/x?a=1&b=2#frag",),  # alias 2 (same resource)
            ("http://a.org/y",),               # fresh
            ("http://a.org/z",),               # already seen
            ("http://a.org/a?PHPSESSID=1",),   # trap: session param
            ("http://a.org/c/p/c/p/c",),       # trap: repeated segments
        ],
        "url string",
    )
    seen = spark.createDataFrame([("http://a.org/z",)], "u string").select(
        hash60("u").alias("seen_key")
    )
    got = {
        r["url"]: r["host"]
        for r in admit_candidates(cands, seen, hash_fn=hash60).collect()
    }
    assert got == {
        "http://a.org/x?a=1&b=2": "a.org",
        "http://a.org/y": "a.org",
    }


# ---- locale hints ----------------------------------------------------------------

def test_url_locale_hint_pins(spark):
    import duckdb
    from pyspark.sql import functions as F

    from dblp_crawler_spark.functions.urlnorm import (
        url_locale_hint,
        url_locale_hint_sql,
    )

    cases = {
        "https://shop.example.de/de/p/1": ("de", "de", None, None, "de"),
        "https://example.com/pt-BR/x": (None, "pt", "br", None, "pt"),
        "https://example.org/page?hl=fr": (None, None, None, "fr", "fr"),
        # path beats query; ccTLD is country, separate from language
        "https://news.example.fr/en/a?lang=es": ("fr", "en", None, "es", "en"),
        "https://example.com/p/9": (None, None, None, None, None),
        # /enigma/ must NOT parse as /en/ (segment boundary)
        "https://a.org/enigma/x": (None, None, None, None, None),
        # bare /en at path end counts
        "https://a.org/en": (None, "en", None, None, "en"),
        "https://a.de:8443/x?locale=pt-br": ("de", None, None, "pt-br", "pt-br"),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    h = url_locale_hint("url")
    got = {
        r.url: (r.h.cc_tld, r.h.path_lang, r.h.path_region, r.h.query_lang, r.h.lang_hint)
        for r in df.select("url", h.alias("h")).collect()
    }
    assert got == cases
    con = duckdb.connect()
    frags = url_locale_hint_sql("u")
    for u, want in cases.items():
        row = con.sql(
            "SELECT " + ", ".join(frags.values()) + f" FROM (SELECT '{u}' AS u)"
        ).fetchone()
        assert row == want, u
