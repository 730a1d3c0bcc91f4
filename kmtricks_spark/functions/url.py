"""URL canonicalization + URL-keyed dedup for web-crawl curation.

Crawl corpora carry the same page under many spellings — scheme/host
case, default ports, trailing slashes, tracking params, fragments. URL
canonicalization is the cheap dedup key that removes refetch duplicates
BEFORE any content hashing (the url column is the input table's primary
key per the Common-Crawl-style schema; `warc_ts` picks the newest fetch).

Everything is pure Column expressions (regexp_extract / filter /
array_sort — whole-stage codegen, no UDFs), deliberately restricted to
constructs with identical semantics in DuckDB so the driver oracle can
re-run the normalization verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped during normalization (public convention:
# Google Analytics utm_*, Facebook fbclid, Google gclid)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")




def url_host(url: Column) -> Column:
    """Lowercased host of a URL with default ports stripped (:80 for
    http, :443 for https) — the grouping key for per-domain curation
    decisions (domain caps, per-site stats). Same host logic as
    url_normalize, factored for reuse; pure Column expressions."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    return F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)


def url_normalize(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped
    (:80 for http, :443 for https), path without trailing slash (root
    becomes empty), tracking params dropped, remaining query params
    sorted, fragment removed."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(url)
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    # prefix excludes both '#' and '?': the capture anchors at the FIRST
    # '?' and only if it precedes any '#' — a '?' inside the fragment
    # ('/a#sec?b=2') must not be parsed as a query string
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
            lambda t: p.startswith(t),
        ),
    )
    qnorm = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", ts_col: str | None = "warc_ts"
) -> DataFrame:
    """One row per canonical URL: the NEWEST fetch when `ts_col` is
    given (the crawl refetch policy), else an arbitrary-but-deterministic
    max over the raw url string. Returns (url_norm, url, <ts>) — one
    shuffle on the canonical key, uniform (hashes of urls)."""
    norm = df.withColumn("url_norm", url_normalize(F.col(url_col)))
    if ts_col is not None:
        pick = norm.groupBy("url_norm").agg(
            F.max(F.struct(F.col(ts_col), F.col(url_col))).alias("__pick"),
            F.count(F.lit(1)).alias("n_fetches"),
        )
        return pick.select(
            "url_norm",
            F.col(f"__pick.{url_col}").alias(url_col),
            F.col(f"__pick.{ts_col}").alias(ts_col),
            "n_fetches",
        )
    return norm.groupBy("url_norm").agg(
        F.max(url_col).alias(url_col), F.count(F.lit(1)).alias("n_fetches")
    )
