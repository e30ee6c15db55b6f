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
    host) ⇒ allowed. The join is an equi-join on the lowercased host,
    so the corpus shuffles once by host (or not at all when the rule
    frame broadcasts); the regex match runs on the joined, host-local
    candidate set. Returns all input columns plus ``crawl_allowed``.
    """
    compiled = rules.select(
        F.col("host").alias("__h"),
        F.col("rule_path"),
        F.col("allow"),
        _rule_regex(F.col("rule_path")).alias("__re"),
        F.length("rule_path").alias("__len"),
    )
    base = urls.withColumn("__h", url_host(F.col(url_col))).withColumn(
        "__path",
        F.when(
            F.regexp_extract(F.trim(F.col(url_col)), _PATH_RE, 1) == "", F.lit("/")
        ).otherwise(F.regexp_extract(F.trim(F.col(url_col)), _PATH_RE, 1)),
    )
    hits = (
        base.join(compiled, "__h", "left")
        .filter(F.col("__re").isNotNull() & F.expr("regexp_like(__path, __re)"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(F.col(url_col)).orderBy(
                    F.col("__len").desc(),
                    F.col("allow").desc(),
                    F.col("rule_path"),
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col(url_col).alias("__u"), F.col("allow").alias("__verdict"))
    )
    return (
        base.join(hits, base[url_col] == F.col("__u"), "left")
        .withColumn("crawl_allowed", F.coalesce(F.col("__verdict"), F.lit(True)))
        .drop("__u", "__verdict", "__h", "__path")
    )
