"""URL canonicalizer edge cases (functions/urls.py) the synthetic
registry layer doesn't reach: non-default ports preserved, http :80
stripped, tracking params removed with the survivors' order kept,
fragment-only suffixes, root paths."""

from pyspark.sql import functions as F

from goka_spark.functions import urls as U


def _canon(spark, raw):
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    out = df.select("url", U.canonical_url(F.col("url")).alias("c"))
    return {r.url: r.c for r in out.collect()}


def test_canonical_edges(spark):
    got = _canon(spark, [
        "https://Host.Example.COM:443/a/",
        "http://host.example.com:80/a",
        "http://host.example.com:8080/a",          # non-default: keep
        "https://host.example.com/a?gclid=x&id=2&utm_source=y&b=1",
        "https://host.example.com/a#only-fragment",
        "https://host.example.com/",               # root path
        "HTTPS://HOST.example.com/A/B//",          # case + multi-slash
    ])
    assert got["https://Host.Example.COM:443/a/"] == \
        "https://host.example.com/a"
    assert got["http://host.example.com:80/a"] == \
        "http://host.example.com/a"
    # non-default port must survive
    assert got["http://host.example.com:8080/a"] == \
        "http://host.example.com:8080/a"
    # tracking params drop, survivors keep their original order
    assert got["https://host.example.com/a?gclid=x&id=2&utm_source=y&b=1"] \
        == "https://host.example.com/a?id=2&b=1"
    assert got["https://host.example.com/a#only-fragment"] == \
        "https://host.example.com/a"
    assert got["https://host.example.com/"] == "https://host.example.com"
    # scheme+host lowercase; PATH case preserved; trailing slashes drop
    assert got["HTTPS://HOST.example.com/A/B//"] == \
        "https://host.example.com/A/B"


def test_canonical_matches_duckdb_on_edges(spark):
    """The crafted edges run through BOTH engines — the SQL fragment
    builders must agree char-for-char off the synthetic layer too."""
    import duckdb

    raw = [
        "https://Host.Example.COM:443/a/",
        "http://host.example.com:8080/a",
        "https://host.example.com/a?gclid=x&id=2&utm_source=y&b=1",
        "HTTPS://HOST.example.com/A/B//#frag",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    sp = {r.url: (r.c, r.h) for r in df.select(
        "url", U.canonical_url(F.col("url")).alias("c"),
        U.canonical_host(F.col("url")).alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in raw])
    dk = {u: (c, h) for u, c, h in con.execute(
        f"SELECT url, {U.canon_sql('url')}, {U.host_sql('url')} FROM t"
    ).fetchall()}
    assert sp == dk
