"""HTML → text extraction (WET-style boilerplate strip, r11).

The other pre-content-dedup production layer (besides URL
canonicalization, operators/urls.py): CommonCrawl-shape pipelines
ingest raw HTML and derive the text the LLM tiers actually consume —
the WARC→WET step. This module is that step as a deterministic,
engine-portable regex chain: strip non-content structure
(head/script/style and the nav/header/footer/aside boilerplate
containers WITH their content), turn block boundaries into newlines,
drop remaining tags, decode the core entities, and normalize
whitespace. Plus the two raw-HTML signals quality filters want
computed BEFORE extraction: the <title> text and the anchor count
(link density is a classic boilerplate/spam signal).

Everything is ``pyspark.sql.functions`` regexp expressions — zero
Python in the hot path, zero shuffle: at 100 TB the extraction is a
scan-time projection riding whole-stage codegen, exactly like
operators/urls.py canonicalize_url. The rule table (``_STRUCTURAL`` /
``_ENTITIES`` / ``_WS``) is the single source of truth: the Spark
column expression AND the DuckDB oracle SQL (q183) are both generated
from it, so the two engines replay byte-identical rules — every
pattern is written in the RE2-compatible subset (inline ``(?is)``
flags, non-greedy, no backreferences) that Java regex and DuckDB/RE2
interpret identically.

Documented limits (regex, not a parser — the WET trade): nested
same-name elements inside a dropped container end at the FIRST
closing tag (non-greedy), attribute values containing a literal ``>``
terminate the tag early, and only the six core entities are decoded.
Real crawls tolerate all three; a DOM-fidelity path would be a
Pandas-UDF parser, deliberately out of the hot tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Elements removed WITH their content: the non-content head, plus the
# boilerplate containers WET-style extractors drop wholesale.
DROP_WITH_CONTENT: tuple[str, ...] = ("script", "style", "nav", "header", "footer", "aside")

# Closing tags that mark a block boundary -> newline.
BLOCK_CLOSERS: tuple[str, ...] = (
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr",
    "table", "ul", "ol", "blockquote", "section", "article",
)

# Inline (phrasing) tags strip to EMPTY, not a space (r12 — VERDICT
# r11 obs. 3): ``bo<b>ld</b>`` must extract as ``bold``, not ``bo ld``
# — inline markup never marks a word boundary, and the space-strip
# form degrades every downstream token/shingle on real HTML. All
# other tags still strip to a space (a structural boundary IS a word
# boundary).
INLINE_TAGS: tuple[str, ...] = (
    "a", "abbr", "b", "bdi", "bdo", "cite", "code", "data", "dfn",
    "em", "i", "kbd", "mark", "q", "s", "samp", "small", "span",
    "strong", "sub", "sup", "time", "u", "var", "wbr",
)

# (pattern, replacement) rule table — applied strictly in order.
# Comments first (they may contain tag-lookalikes), containers next,
# then block boundaries, then the inline strip (to empty), then the
# generic tag strip (to space), THEN entity decode (an encoded &lt;
# must never be re-parsed as markup), then whitespace normalization.
_STRUCTURAL: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<head\b[^>]*>.*?</head>", ""),
    *[(rf"(?is)<{t}\b[^>]*>.*?</{t}>", "") for t in DROP_WITH_CONTENT],
    (r"(?i)<(br|hr)\b[^>]*>", "\n"),
    (rf"(?is)</({'|'.join(BLOCK_CLOSERS)})\s*>", "\n"),
    (rf"(?is)</?({'|'.join(INLINE_TAGS)})\b[^>]*>", ""),
    (r"(?s)<[/!]?[A-Za-z][^>]*>", " "),
)
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # decoded LAST — see the ordering note below
)
_WS: tuple[tuple[str, str], ...] = (
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^\s+|\s+$", ""),
)
# Note on &amp; ordering: decoding it LAST means "&amp;lt;" becomes
# the literal text "&lt;" (correct HTML semantics) instead of "<"
# (the double-decode bug that re-opens tag injection).

STEPS: tuple[tuple[str, str], ...] = _STRUCTURAL + _ENTITIES + _WS

# \shref\b (not \bhref): \b also matches after "-"/":" so data-href /
# xlink:href would count as real links, and without the trailing \b
# hreflang would too — attributes are whitespace-separated, so the
# explicit \s is the correct anchor on both regex engines.
_LINK_RE = r"(?is)<a\b[^>]*\shref\b"
_TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title>"


def _apply(col: Column, steps: tuple[tuple[str, str], ...]) -> Column:
    for pat, repl in steps:
        col = F.regexp_replace(col, pat, repl)
    return col


def extract_html_text(html: Column) -> Column:
    """Clean text of an HTML document: paragraphs separated by single
    newlines, collapsed interior whitespace, no leading/trailing
    whitespace. Pure JVM regexp chain (rule table above)."""
    return _apply(html, STEPS)


def html_title(html: Column) -> Column:
    """Text of the first <title> element (entity-decoded, whitespace-
    normalized); empty string when absent. Runs on the RAW html —
    extract_html_text drops the head."""
    return _apply(F.regexp_extract(html, _TITLE_RE, 1), _ENTITIES + _WS)


def html_link_count(html: Column) -> Column:
    """Number of anchor-with-href tags in the RAW html — the numerator
    of the link-density boilerplate signal."""
    return F.size(F.regexp_extract_all(html, F.lit(_LINK_RE), 0)).cast("bigint")


# --- DuckDB oracle generation (q183) ---------------------------------------
# The oracle SQL replays the IDENTICAL rule table through DuckDB's
# RE2 regexp_replace, generated here so the engines cannot drift.


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_apply(expr: str, steps: tuple[tuple[str, str], ...]) -> str:
    for pat, repl in steps:
        repl_sql = "chr(10)" if repl == "\n" else _sql_lit(repl)
        expr = f"regexp_replace({expr}, {_sql_lit(pat)}, {repl_sql}, 'g')"
    return expr


def sql_extract_text(expr: str) -> str:
    """DuckDB expression: extract_html_text(expr), same rule table."""
    return _sql_apply(expr, STEPS)


def sql_title(expr: str) -> str:
    """DuckDB expression: html_title(expr), same rule table."""
    return _sql_apply(
        f"regexp_extract({expr}, {_sql_lit(_TITLE_RE)}, 1)", _ENTITIES + _WS
    )


def sql_link_count(expr: str) -> str:
    """DuckDB expression: html_link_count(expr)."""
    return f"len(regexp_extract_all({expr}, {_sql_lit(_LINK_RE)}))"
