"""URL canonicalization truth table + DuckDB oracle parity."""

import duckdb
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.urls import canonicalize_sql, canonicalize_urls

CASES = [
    ("HTTP://WWW.Example.COM:80/Path/File#frag",
     "http://www.example.com/Path/File"),          # default port + frag
    ("https://Host.example:443/", "https://host.example/"),
    ("https://host.example:8443/x", "https://host.example:8443/x"),
    ("http://host.example", "http://host.example/"),   # empty path -> /
    ("HtTpS://A.B/Q?x=1#y", "https://a.b/Q?x=1"),       # query preserved
    ("not a url #fragment", "not a url "),              # passthrough
    ("ftp://Files.Example:21/a", "ftp://files.example:21/a"),  # non-http
]


def _table():
    return pa.table({"url": pa.array([c[0] for c in CASES], pa.string())})


def test_canonicalize_truth(ray_session):
    out = canonicalize_urls(rd.from_arrow(_table())).to_pandas()
    assert out["url_canon"].tolist() == [c[1] for c in CASES]
    # input column untouched
    assert out["url"].tolist() == [c[0] for c in CASES]


def test_canonicalize_matches_duckdb(ray_session):
    con = duckdb.connect()
    con.register("t", _table().to_pandas())
    ora = con.execute(
        f"SELECT {canonicalize_sql('url')} AS c FROM t").fetch_df()
    got = canonicalize_urls(rd.from_arrow(_table())).to_pandas()
    assert got["url_canon"].tolist() == ora["c"].tolist()
