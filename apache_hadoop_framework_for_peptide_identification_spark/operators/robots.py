"""robots.txt parsing + URL compliance filtering (r12).

The fetch-side compliance layer of the crawl ladder (RFC 9309, the
Robots Exclusion Protocol): a crawl pipeline holds one robots.txt text
per host and must decide, for every candidate URL, whether the chosen
user-agent may fetch it. Spark-first like the rest of the layer
(operators/urls.py, operators/warc.py):

- :func:`parse_robots` turns (host, robots_text) rows into a RULE
  frame — one row per (host, rule_path, allow) for the group the
  user-agent selects — using the gaps-and-islands idiom over exploded
  lines: a group is one-or-more consecutive ``User-agent`` lines plus
  the rules that follow; the UA-specific groups win over the ``*``
  groups when both exist for a host (RFC 9309 §2.2.1, simplified to
  exact-token-or-* matching — product-token prefix matching is the
  documented out-of-scope refinement). All per-host windows — a
  robots corpus is one small text per host, so the shuffle is keyed
  by host and carries rule-sized rows, never the URL corpus.
- :func:`robots_filter` joins the rule frame to a URL corpus by host
  and resolves each URL per the spec: among rules whose path-pattern
  matches the URL's path, the LONGEST rule wins, ties prefer Allow,
  and a URL matching no rule is allowed (§2.2.2). Rule paths support
  the spec's two metacharacters — ``*`` (any span) and a trailing
  ``$`` (end anchor) — compiled to a safe regex ON THE RULE FRAME
  (everything else regexp-escaped), so the per-URL match is one
  ``regexp_like`` against an equi-joined, host-local rule set:
  cost is URLs × rules-per-host, output-proportional, no all-pairs.

Documented trades: matching uses the URL's PATH (query string
excluded — Google's reference matcher includes it; planted oracles
pin the path-only rule), ``Crawl-delay``/``Sitemap`` and other
non-rule directives are ignored, and an empty ``Disallow:`` (allow
everything — the historical idiom) is honored by dropping the empty
rule. Everything is engine-portable expressions; the q186 oracle
replays parse + resolution rule-for-rule in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .urls import _PATH_RE, url_host


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Parse robots.txt texts into the rule frame ``(host, rule_path,
    allow)`` for the group(s) ``user_agent`` selects. Group assembly is
    gaps-and-islands over the exploded lines (per-host windows):
    consecutive ``User-agent`` lines open a group; ``Allow``/
    ``Disallow`` lines attach to the latest group; comments (``#``),
    blank lines, and unknown directives are inert. Directive names are
    case-insensitive and tolerate whitespace + ``\\r`` line endings.
    Groups naming ``user_agent`` (case-insensitive exact token) beat
    the ``*`` groups per host; hosts with neither yield no rules (and
    therefore allow everything downstream)."""
    ua = user_agent.lower()
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip \r and comments, then trim
        F.trim(F.regexp_replace(F.regexp_replace("line", "#.*", ""), "\r", "")).alias(
            "line"
        ),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([A-Za-z\-]+)\s*:", 1))).alias(
            "directive"
        ),
        F.trim(F.regexp_extract("line", r"^[A-Za-z\-]+\s*:(.*)$", 1)).alias("value"),
    ).filter(F.col("directive").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    prev_ua = F.lag(is_ua, 1, False).over(w)
    starts = parsed.withColumn(
        "group_id", F.sum((is_ua & ~prev_ua).cast("int")).over(w)
    )
    # Which groups does the UA select? Exact-token groups win over '*'.
    group_uas = (
        starts.filter(is_ua)
        .groupBy("host", "group_id")
        .agg(
            F.max((F.lower(F.col("value")) == ua).cast("int")).alias("has_ua"),
            F.max((F.col("value") == "*").cast("int")).alias("has_star"),
        )
    )
    host_pref = group_uas.groupBy("host").agg(
        F.max("has_ua").alias("any_ua")
    )
    chosen = (
        group_uas.join(host_pref, "host")
        .filter(
            ((F.col("any_ua") == 1) & (F.col("has_ua") == 1))
            | ((F.col("any_ua") == 0) & (F.col("has_star") == 1))
        )
        .select("host", "group_id")
    )
    rules = (
        starts.filter(~is_ua)
        .join(chosen, ["host", "group_id"])
        .filter(F.col("value") != "")  # empty Disallow: == allow all (no rule)
        .select(
            "host",
            F.col("value").alias("rule_path"),
            (F.col("directive") == "allow").alias("allow"),
        )
        .distinct()
    )
    return rules


def robots_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` directives from robots.txt — one ``(host,
    sitemap_url)`` row per line (r12; the connector between this
    module and urls.parse_sitemap: robots_sitemaps finds the sitemap
    URLs, a fetcher pulls them, parse_sitemap explodes their entries
    into the frontier). Per RFC 9309 §2.3 the directive is
    INDEPENDENT of user-agent groups, so every Sitemap line counts
    regardless of position; names are case-insensitive, values keep
    their case (URLs), comments and CRLFs are stripped, empty values
    drop. Pure split/regexp projections — no UDF, one explode."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(robots_col), "\n")).alias("line"),
    ).select(
        "host",
        F.trim(F.regexp_replace(F.regexp_replace("line", "#.*", ""), "\r", "")).alias(
            "line"
        ),
    )
    return (
        lines.filter(F.lower(F.col("line")).rlike(r"^sitemap\s*:"))
        .select(
            "host",
            F.trim(F.regexp_extract("line", r"(?i)^sitemap\s*:(.*)$", 1)).alias(
                "sitemap_url"
            ),
        )
        .filter(F.col("sitemap_url") != "")
    )


def _rule_regex(rule_path):
    """Compile a robots rule path to an anchored regex: everything
    regexp-escaped except the spec's two metacharacters — ``*`` spans
    anything, a TRAILING ``$`` anchors the end (a non-trailing ``$``
    is a literal). Runs on the RULE frame (small), not per URL."""
    ends_anchored = rule_path.endswith("$")
    body = F.when(ends_anchored, F.expr("substring(rule_path, 1, length(rule_path) - 1)")).otherwise(
        rule_path
    )
    # escape regex metacharacters, then turn the escaped \* back into .*
    escaped = F.regexp_replace(body, r"([.\[\]{}()+?^$\\|*])", r"\\$1")
    wild = F.regexp_replace(escaped, r"\\\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(ends_anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Resolve every URL against the rule frame :func:`parse_robots`
    produced: adds ``crawl_allowed`` (boolean). Longest matching rule
    wins; ties prefer Allow; no matching rule (or no rules for the
    host) ⇒ allowed. Returns all input columns plus ``crawl_allowed``.

    SINGLE-PASS shape (r12 review finding — the first form re-joined
    the winner verdicts back to the corpus, paying a second corpus
    scan and a url-keyed shuffle): the compiled rules collapse to ONE
    array row per host, that tiny frame broadcast-joins the corpus on
    the lowercased host, and the longest-match/Allow-ties resolution
    is a map-side ``aggregate`` fold over the host's rule array — the
    corpus is scanned once and never shuffles at all. Rules per host
    are bounded by the robots.txt file size, so the fold is a short
    per-row loop.
    """
    compiled = rules.select(
        F.col("host").alias("__h"),
        _rule_regex(F.col("rule_path")).alias("__re"),
        F.length("rule_path").alias("__len"),
        F.col("allow"),
    )
    per_host = compiled.groupBy("__h").agg(
        F.collect_list(F.struct("__re", "__len", "allow")).alias("__rules")
    )
    base = urls.withColumn("__h", url_host(F.col(url_col))).withColumn(
        "__path",
        F.when(
            F.regexp_extract(F.trim(F.col(url_col)), _PATH_RE, 1) == "", F.lit("/")
        ).otherwise(F.regexp_extract(F.trim(F.col(url_col)), _PATH_RE, 1)),
    )
    joined = base.join(F.broadcast(per_host), "__h", "left")
    empty = F.array().cast("array<struct<__re:string,__len:int,allow:boolean>>")
    init = F.struct(F.lit(-1).alias("l"), F.lit(True).alias("a"))
    # Fold: keep (longest match, Allow on equal length); init (-1, True)
    # doubles as the no-match default-allow.
    verdict = F.aggregate(
        F.coalesce(F.col("__rules"), empty),
        init,
        lambda acc, r: F.when(
            F.regexp_like(F.col("__path"), r["__re"])
            & (
                (r["__len"] > acc["l"])
                | ((r["__len"] == acc["l"]) & r["allow"] & ~acc["a"])
            ),
            F.struct(r["__len"].alias("l"), r["allow"].alias("a")),
        ).otherwise(acc),
    )
    return joined.withColumn("crawl_allowed", verdict["a"]).drop(
        "__h", "__path", "__rules"
    )
