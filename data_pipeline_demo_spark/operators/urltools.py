"""URL canonicalization + URL-level dedup — the web-corpus prep step
that runs BEFORE any content dedup: the same page crawled as
``HTTP://Example.COM:80/a/?b=2&a=1&utm_source=feed#frag`` and
``http://example.com/a?a=1&b=2`` must collapse to one canonical key,
or every downstream URL-keyed join/dedup/frequency count silently
splits its groups. (Reference scope: the reference pipeline keys its
ledger on source identity — ``/root/reference/data_pipeline.py:106-161``
— this is the same exactly-once identity problem at web scale.)

Canonicalization applied (the conservative, semantics-preserving
subset every crawler agrees on):

- scheme and host lowercase;
- default port stripped (``:80`` for http, ``:443`` for https);
- fragment dropped (client-side only, never part of page identity);
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref_src``);
- remaining query parameters SORTED (order is transport noise);
- trailing slash stripped from non-root paths;
- empty query/path normalized away.

Scale shape: pure ``pyspark.sql.functions`` over Spark's built-in
``parse_url`` — whole-stage codegen, zero UDFs, zero shuffles for the
canonical column itself; the dedup aggregation shuffles once on the
canonical key like any groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# dropped wholesale: analytics/campaign noise that never affects the
# fetched content
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref_src)="


def canonical_url(url: Column | str) -> Column:
    """The canonical form of a URL column (see module docstring)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    # AUTHORITY keeps the port; HOST drops it — a non-default port is
    # identity-bearing and must survive
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    port = F.when(
        authority.contains(":"),
        F.regexp_extract(authority, r":(\d+)$", 1),
    ).otherwise(F.lit(""))
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    ).otherwise(F.lit(""))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    # strip ONE trailing slash from non-root paths; '' and '/' both
    # normalize to '' (http://h and http://h/ are the same resource)
    path = F.when(path == "/", F.lit("")).otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )


def url_dedup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group documents by canonical URL: ``(canonical_url, n_docs,
    min_doc)`` — the keep-min-id convention the exact-dedup tier uses.
    One hash aggregation on the canonical key; the canonicalization
    itself is codegen-only."""
    return (
        df.select(
            F.col(id_col), canonical_url(url_col).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc"),
        )
    )
