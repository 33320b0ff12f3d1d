"""URL canonicalization — the web-crawl curation primitive.

Every crawl-derived corpus (C4, CCNet, RefinedWeb) dedups on a
CANONICAL URL before any content hash: the same page arrives under
uppercase hosts, default ports, tracking parameters (utm_*, fbclid,
gclid), fragments, and trailing slashes, and counting it once is the
cheapest dedup there is.  The documents table has no URL column, so
the queries derive a deterministic synthetic URL per doc (the
multimodal-decode discipline: fake the payload, keep the Spark-side
plumbing real) whose noise variants canonicalize back together.

The whole chain is scan-stage ``Column`` expressions (regex extract /
replace, split + filter + join) — zero shuffle, zero UDF — and every
step is replayed verbatim in DuckDB SQL, so the canonicalizer itself
is engine-verified (all regexes are RE2-safe: no backrefs, no
lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params stripped by the canonicalizer (prefix match on "name=")
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$"


def synthetic_url(doc_id: Column) -> Column:
    """Deterministic messy URL for a doc: three consecutive doc_ids
    share one logical page (base = doc_id DIV 3) and the residue
    doc_id % 6 picks the noise variant — plain, uppercased host,
    explicit default port, tracking params, fragment, or trailing
    slash + mixed params.  The host derives from the shared page id
    only (NOT per-row columns like source — those differ across the
    three docs of a page and would defeat the collapse).  Variants
    0-2 canonicalize to one string, 3-4 to the same, 5 keeps its
    non-tracking ``id=7`` param."""
    d = doc_id.cast("long")
    # exact integer floor-div: the numerator is divisible by 3, so the
    # double division is exact for any realistic id range (< 2^53)
    base = ((d - d % 3) / 3).cast("long")
    tld = (F.when(base % 3 == 0, "com")
           .when(base % 3 == 1, "org").otherwise("net"))
    host = F.concat(F.lit("site"), (base % 140).cast("string"),
                    F.lit(".example."), tld)
    path = F.concat(F.lit("/p/"), base.cast("string"))
    v = doc_id.cast("long") % 6
    pre = F.lit("https://")
    return (F.when(v == 0, F.concat(pre, host, path))
            .when(v == 1, F.concat(pre, F.upper(host), path))
            .when(v == 2, F.concat(pre, host, F.lit(":443"), path))
            .when(v == 3, F.concat(pre, host, path,
                                   F.lit("?utm_source=feed"
                                         "&utm_campaign=push")))
            .when(v == 4, F.concat(pre, host, path, F.lit("#section-2")))
            .otherwise(F.concat(pre, host, path,
                                F.lit("/?id=7&utm_medium=email"))))


def canonical_url(url: Column) -> Column:
    """Canonical form: fragment dropped; scheme + host lowercased;
    default port stripped (:443 for https, :80 for http); tracking
    params (TRACKING_PREFIXES) removed with the remaining params kept
    in original order; trailing slashes stripped from the path."""
    u1 = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u1, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u1, _HOST_RE, 1))
    host = (F.when(scheme == "https",
                   F.regexp_replace(hostport, ":443$", ""))
            .when(scheme == "http",
                  F.regexp_replace(hostport, ":80$", ""))
            .otherwise(hostport))
    rest = F.regexp_extract(u1, _REST_RE, 1)
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1),
                            "/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~(F.startswith(p, F.lit("utm_"))
                    | F.startswith(p, F.lit("fbclid="))
                    | F.startswith(p, F.lit("gclid="))
                    | (p == "")))
    q2 = F.array_join(kept, "&")
    return F.concat(scheme, F.lit("://"), host, path,
                    F.when(q2 != "", F.concat(F.lit("?"), q2))
                    .otherwise(F.lit("")))


def canonical_host(url: Column) -> Column:
    """Lowercased host with the default port stripped — the grouping
    key for per-domain stats and caps."""
    u1 = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u1, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u1, _HOST_RE, 1))
    return (F.when(scheme == "https",
                   F.regexp_replace(hostport, ":443$", ""))
            .when(scheme == "http",
                  F.regexp_replace(hostport, ":80$", ""))
            .otherwise(hostport))


# ---- oracle SQL fragments (DuckDB) — the same chain, verbatim ------

SYNTH_URL_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN 'https://' || __HOST__ || __PATH__
        WHEN 1 THEN 'https://' || upper(__HOST__) || __PATH__
        WHEN 2 THEN 'https://' || __HOST__ || ':443' || __PATH__
        WHEN 3 THEN 'https://' || __HOST__ || __PATH__
                    || '?utm_source=feed&utm_campaign=push'
        WHEN 4 THEN 'https://' || __HOST__ || __PATH__ || '#section-2'
        ELSE 'https://' || __HOST__ || __PATH__
             || '/?id=7&utm_medium=email'
      END
""".replace("__HOST__",
            "('site' || CAST((doc_id // 3) % 140 AS VARCHAR)"
            " || '.example.' || CASE (doc_id // 3) % 3"
            " WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)") \
   .replace("__PATH__", "('/p/' || CAST(doc_id // 3 AS VARCHAR))")


def canon_sql(url_expr: str) -> str:
    """DuckDB expression computing canonical_url(url_expr)."""
    u1 = f"regexp_replace({url_expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({u1}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u1}, '{_HOST_RE}', 1))"
    host = (f"CASE WHEN {scheme} = 'https'"
            f" THEN regexp_replace({hostport}, ':443$', '')"
            f" WHEN {scheme} = 'http'"
            f" THEN regexp_replace({hostport}, ':80$', '')"
            f" ELSE {hostport} END")
    rest = f"regexp_extract({u1}, '{_REST_RE}', 1)"
    path = (f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1),"
            f" '/+$', '')")
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    q2 = ("array_to_string(list_filter(str_split(" + query + ", '&'),"
          " p -> NOT (starts_with(p, 'utm_')"
          " OR starts_with(p, 'fbclid=')"
          " OR starts_with(p, 'gclid=') OR p = '')), '&')")
    return (f"({scheme} || '://' || {host} || {path}"
            f" || CASE WHEN {q2} <> '' THEN '?' || {q2}"
            f" ELSE '' END)")


def host_sql(url_expr: str) -> str:
    """DuckDB expression computing canonical_host(url_expr)."""
    u1 = f"regexp_replace({url_expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({u1}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u1}, '{_HOST_RE}', 1))"
    return (f"(CASE WHEN {scheme} = 'https'"
            f" THEN regexp_replace({hostport}, ':443$', '')"
            f" WHEN {scheme} = 'http'"
            f" THEN regexp_replace({hostport}, ':80$', '')"
            f" ELSE {hostport} END)")
