"""HTTP cache policy from raw response headers: directive
precedence (no-store > s-maxage > max-age > Expires-Date), token
boundaries, malformed-date absorption, and the DuckDB replay."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.freshness import cache_policy, cache_policy_sql

H = [
    # url, header block, (no_store, no_cache, ttl_s)
    ("u1", "HTTP/1.1 200 OK\r\nDate: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
           "Cache-Control: public, max-age=3600\r\nContent-Type: text/html\r\n",
     (False, False, 3600)),
    # s-maxage wins over max-age for a shared cache
    ("u2", "Cache-Control: public, max-age=60, s-maxage=600\r\n",
     (False, False, 600)),
    ("u3", "Cache-Control: no-store, max-age=900\r\n", (True, False, 0)),
    # no-cache is storable-but-revalidate; ttl still honored
    ("u4", "cache-control: NO-CACHE, max-age=120\r\n", (False, True, 120)),
    # Expires - Date fallback (2h)
    ("u5", "Date: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
           "Expires: Tue, 19 Aug 2026 05:00:00 GMT\r\n",
     (False, False, 7200)),
    # Expires in the past clamps to 0, never negative
    ("u6", "Date: Tue, 19 Aug 2026 03:00:00 GMT\r\n"
           "Expires: Mon, 18 Aug 2026 03:00:00 GMT\r\n",
     (False, False, 0)),
    # Expires without Date: no reference point -> NULL, not 0
    ("u7", "Expires: Tue, 19 Aug 2026 05:00:00 GMT\r\n", (False, False, None)),
    # no caching headers at all
    ("u8", "Content-Type: image/png\r\nServer: x\r\n", (False, False, None)),
    # malformed date absorbed to NULL
    ("u9", "Date: yesterday-ish\r\nExpires: Tue, 19 Aug 2026 05:00:00 GMT\r\n",
     (False, False, None)),
    # token boundary: no-storefront must not read as no-store;
    # max-age must not match inside s-maxage
    ("u10", "Cache-Control: no-storefront, s-maxage=50\r\n", (False, False, 50)),
]


def _df(spark):
    return spark.createDataFrame(
        [(u, h) for u, h, _ in H], "url string, headers string"
    )


def test_pinned_policies(spark):
    got = {r.url: (r.no_store, r.no_cache, r.ttl_s)
           for r in cache_policy(_df(spark)).collect()}
    for url, _, want in H:
        assert got[url] == want, (url, got[url], want)


def test_matches_duckdb_replay(spark):
    eng = sorted(tuple(r) for r in cache_policy(_df(spark)).collect())
    con = duckdb.connect()
    con.register("responses",
                 pd.DataFrame([(u, h) for u, h, _ in H], columns=["url", "headers"]))
    ora = sorted(con.execute(cache_policy_sql("responses")).fetchall())
    assert eng == ora
