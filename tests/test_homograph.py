"""IDN homograph detection (operators/hostdup.idn_homograph /
homograph_pairs)."""

import duckdb
import pandas as pd

from dblp_crawler_spark.operators.hostdup import (
    homograph_pairs,
    homograph_pairs_sql,
    idn_homograph,
    idn_homograph_sql,
)

HOSTS = [
    "google.com",
    "googlе.com",         # Cyrillic е U+0435
    "g00gle.com",         # digit 0 for o
    "paypal.com",
    "pаypal.com",         # Cyrillic а U+0430
    "xn--pypal-4ve.com",  # punycode label
    "site1.org",          # digit host with NO target — must stay silent
    "νiagra.net",         # Greek ν U+03BD, no registered target
    "GOOGLE.com",         # case folds into the target
]


def _df(spark):
    return spark.createDataFrame([(h,) for h in HOSTS], "host string")


def test_per_host_flags(spark):
    got = {r.host: r.asDict() for r in idn_homograph(_df(spark)).collect()}
    # lowercased + distinct: GOOGLE.com collapsed into google.com
    assert "GOOGLE.com" not in got and len(got) == len(HOSTS) - 1

    assert got["google.com"]["ascii_only"] is True
    assert got["google.com"]["mixed_script"] is False
    assert got["google.com"]["skeleton"] == "google.com"

    assert got["googlе.com"]["ascii_only"] is False
    assert got["googlе.com"]["mixed_script"] is True
    assert got["googlе.com"]["skeleton"] == "google.com"

    assert got["g00gle.com"]["ascii_only"] is True
    assert got["g00gle.com"]["mixed_script"] is False
    assert got["g00gle.com"]["skeleton"] == "google.com"

    assert got["xn--pypal-4ve.com"]["has_punycode"] is True
    assert got["xn--pypal-4ve.com"]["mixed_script"] is False

    # Greek confusable maps, but mixed_script also fires
    assert got["νiagra.net"]["skeleton"] == "viagra.net"
    assert got["νiagra.net"]["mixed_script"] is True

    assert got["site1.org"]["skeleton"] == "sitel.org"


def test_pairs_and_replay(spark):
    pairs = {(r.imposter, r.target)
             for r in homograph_pairs(_df(spark)).collect()}
    assert pairs == {
        ("googlе.com", "google.com"),
        ("g00gle.com", "google.com"),
        ("pаypal.com", "paypal.com"),
    }

    con = duckdb.connect()
    con.register("hosts", pd.DataFrame(HOSTS, columns=["host"]))
    sp1 = (idn_homograph(_df(spark)).toPandas()
           .sort_values("host").reset_index(drop=True))
    dk1 = (con.sql(idn_homograph_sql("hosts")).df()
           .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(sp1, dk1[sp1.columns], check_dtype=False)

    sp2 = (homograph_pairs(_df(spark)).toPandas()
           .sort_values(["imposter", "target"]).reset_index(drop=True))
    dk2 = (con.sql(homograph_pairs_sql("hosts")).df()
           .sort_values(["imposter", "target"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sp2, dk2[sp2.columns], check_dtype=False)
