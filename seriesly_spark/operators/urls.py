"""URL canonicalization for web-corpus curation.

Crawl-scale dedup runs on the URL BEFORE it runs on content: the same
page arrives as `HTTP://WWW.Example.com:80/a/?utm_source=feed&b=1#top`
and `http://www.example.com/a/?b=1`, and treating those as two documents
double-counts every fetch. The canonical form here follows RFC 3986
§6.2.2-6.2.3 (case + default-port + empty-path normalization) plus the
two de-facto crawl rules every pipeline adds: tracking-parameter removal
(utm_*/gclid/fbclid) and query-parameter ordering.

Everything is built-in Column expressions (regexp_extract / split /
filter / array_sort) — JVM-side, whole-stage-codegen'd, no shuffle; the
dedup rollup after it is one hash aggregate on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one tracking param == an entire key=value unit whose key is utm_* /
# gclid / fbclid (case-insensitive, per industry convention)
_TRACKING_RE = r"^(?i)(utm_[^=]*|gclid|fbclid)="


def normalize_url(url: Column) -> Column:
    """Canonical URL (RFC 3986 normalization + crawl conventions):

    * scheme and host lowercase (case-insensitive per RFC)
    * default port stripped (``:80`` for http, ``:443`` for https)
    * fragment dropped (never sent to the server)
    * tracking params dropped (``utm_*``, ``gclid``, ``fbclid``)
    * remaining query params sorted byte-wise (order never reaches the
      application on well-formed sites; sorting makes param order a
      non-identity)
    * empty path -> ``/``; a single trailing slash on a non-root path
      is stripped
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, r"^[^:/?]+://([^/?]+)", 1)
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path_raw = F.regexp_extract(u, r"^[^:/?]+://[^/?]+([^?]*)", 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(
        F.when(
            F.length(path_raw) > 1,
            F.regexp_replace(path_raw, r"/$", ""),
        ).otherwise(path_raw)
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (F.regexp_count(p, F.lit(_TRACKING_RE)) == 0),
    )
    q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_dedup_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Canonicalize and roll up: one row per canonical URL with its raw
    variant count — the fetch-dedup table a crawler consults. Narrow
    projection + ONE hash aggregate on the canonical string; at corpus
    scale hash the canonical form to md5 first if the strings are long
    (same md5-before-shuffle trick as dedup_exact)."""
    return (
        df.select(normalize_url(F.col(url_col)).alias("url_norm"))
        .groupBy("url_norm")
        .agg(F.count(F.lit(1)).alias("n_variants"))
    )
