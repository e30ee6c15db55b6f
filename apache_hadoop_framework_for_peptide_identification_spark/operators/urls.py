"""URL canonicalization + keep-best-per-URL dedup (r11).

The production layer CommonCrawl-shape corpus pipelines run BEFORE
every content-dedup tier (exact q40 → normalized q144 → fuzzy q113 →
span q177): the same page is crawled under syntactically different
URLs — case-varied scheme/host, explicit default ports, fragments,
tracking parameters, shuffled query-parameter order, trailing
slashes — and collapsing those BY URL is orders of magnitude cheaper
than letting the content tiers discover the duplication, because it
needs no text at all: one string expression per row plus one window
over the canonical key.

Everything here is pure JVM-side string/array expressions
(``pyspark.sql.functions`` regex + higher-order functions) — no UDFs,
no shuffle for canonicalization itself, fully SQL-expressible (the
DuckDB oracle replays the identical rules, q179). At 100 TB the
canonical column is computed in the scan's projection (whole-stage
codegen) and the only shuffle is the keeper window's hash partition
on the canonical key — the same cost profile as exact_dedup.

Canonical form (the RFC 3986 §6 normalizations that are safe without
fetching, plus the tracking-param scrub every crawl pipeline adds):

- scheme and host lowercased (path/query case is significant — left);
- default port stripped (``:80`` for http, ``:443`` for https);
- fragment removed (never sent to the server);
- tracking parameters removed: any ``utm_*`` plus the well-known
  click-identifier set (fbclid, gclid, msclkid, yclid, igshid,
  mc_eid, _ga) — extend via ``extra_tracking``;
- remaining query parameters sorted lexicographically (crawlers see
  permuted orders; sorting makes order-insensitive equality exact —
  the rare order-SENSITIVE endpoint is the documented trade);
- trailing slashes stripped from the path, empty path becomes ``/``
  (``http://h``, ``http://h/`` and ``http://h///`` all canonicalize
  to ``http://h/``);
- empty query (or one emptied by the scrub) drops its ``?``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Exact-name click identifiers scrubbed alongside the utm_* prefix
# family. Keep in sync with the q179 oracle's regex.
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "yclid", "igshid", "mc_eid", "_ga")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _tracking_regex(extra: tuple[str, ...] = ()) -> str:
    names = "|".join(TRACKING_PARAMS + tuple(extra))
    return rf"^(utm_[^=]*|{names})(=.*)?$"


def canonicalize_url(url, extra_tracking: tuple[str, ...] = ()):
    """Column expression computing the canonical form of ``url``.

    Pure built-in expressions (regexp_extract / filter / array_sort /
    array_join) so the whole computation stays inside whole-stage
    codegen — this is a per-row projection, usable in a scan without
    any shuffle. Inputs without a ``scheme://`` prefix pass through
    trimmed-and-defragmented only (canonicalizing a relative URL
    needs a base URL this operator does not have).
    """
    u = F.regexp_replace(F.trim(url), "#.*", "")  # fragment never reaches the server
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qraw = F.regexp_extract(u, _QUERY_RE, 1)
    track = _tracking_regex(extra_tracking)
    params = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "") & ~p.rlike(track),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_keeper_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    quality_col: str,
    extra_tracking: tuple[str, ...] = (),
    canon_out: str = "canon_url",
) -> DataFrame:
    """Keep the best row per CANONICAL URL: canonicalize ``url_col``
    per row (projection, no shuffle), then one (quality desc, id)
    row_number window over the canonical key — q176's keeper rule,
    but keyed directly by the canonical string, so no edge generation
    and no connected components: URL identity is an equivalence
    relation for free, unlike near-dup similarity.

    Returns the kept rows (all input columns) plus ``canon_out``.
    One shuffle total, hash-partitioned on the canonical key. Skew
    note for 100 TB: a canonical URL repeated pathologically often
    (a crawler trap) concentrates one key; the window stays correct —
    cap it with the standard two-phase trick (per-partition top-1
    via a partial aggregate, then global) only if a profile shows a
    single hot URL dominating a partition, which AQE skew handling
    already splits in practice.
    """
    canon = canonicalize_url(F.col(url_col), extra_tracking)
    with_canon = df.withColumn(canon_out, canon)
    w = Window.partitionBy(canon_out).orderBy(F.col(quality_col).desc(), F.col(id_col))
    return (
        with_canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
