"""Hand-ground-truth tests for HTML → text extraction (r11).

The q183 oracle proves the rule chain is engine-portable (the DuckDB
side is GENERATED from the same table); these cases pin the chain to
HUMAN-expected output — independent of both engines — including the
documented limits (non-greedy container close, entity decode order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import html as H


def _extract(spark, raw: list[str]) -> list[tuple[str, str, int]]:
    df = spark.createDataFrame([(i, s) for i, s in enumerate(raw)], "i long, html string")
    rows = (
        df.select(
            "i",
            H.extract_html_text(F.col("html")).alias("t"),
            H.html_title(F.col("html")).alias("ti"),
            H.html_link_count(F.col("html")).alias("n"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r["t"], r["ti"], r["n"]) for r in rows]


CASES = [
    # (html, expected_text, expected_title, expected_links)
    (
        '<!DOCTYPE html><html><head><title> A &amp; B </title>'
        "<style>p{color:red}</style><script>if (1 < 2) { x(\"a&b\"); }</script></head>"
        '<body><nav><a href="/h">Home</a></nav><h1>Hi</h1><p>one two</p>'
        '<footer><a href="/t">T</a></footer></body></html>',
        "Hi\none two",
        "A & B",
        2,  # link count runs on RAW html: nav + footer anchors
    ),
    # block closers and <br>/<hr> become newlines; runs collapse
    ("<div>a</div><div>b<br>c</div><hr/>d", "a\nb\nc\nd", "", 0),
    # uppercase tags and attributes
    ('<P CLASS="x">up</P><BR>down', "up\ndown", "", 0),
    # comment containing tag-lookalikes is dropped before tag strip
    ("<p>keep</p><!-- <p>drop</p> --><p>also</p>", "keep\nalso", "", 0),
    # entities: all six, &amp; decoded LAST so &amp;lt; -> literal &lt;
    (
        "x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y &amp; z &amp;lt;",
        'x <tag> "q" \'s\' y & z &lt;',
        "",
        0,
    ),
    # whitespace: tabs/CR collapse, spaces around newlines trimmed
    ("<p>a \t b</p>\r\n  <p>c</p>  ", "a b\nc", "", 0),
    # boilerplate containers dropped WITH content; <head> prefix-safe
    # (<header> must not be eaten by the <head> rule's \b)
    (
        "<header>top nav</header><aside>ads</aside><p>body</p>",
        "body",
        "",
        0,
    ),
    # documented limit: non-greedy close — nested same-name container
    # ends at the FIRST closing tag
    (
        "<nav>outer <nav>inner</nav> tail</nav><p>x</p>",
        # removal ends at the FIRST </nav>; the dangling " tail</nav>"
        # survives, its </nav> stripped to a space (nav is not a block
        # closer), then <p>x</p> contributes the rest
        "tail x",
        "",
        0,
    ),
    # inline tags strip to EMPTY (r12 — no word split), other tags to
    # a space; anchors are inline too
    (
        "bo<b>ld</b> and <span class='x'>span</span>py "
        '<em>em</em>pha<i>sized</i> <a href="/x">link</a>ed<table><tr>'
        "<td>cell</td></tr></table>",
        # opening <table>/<tr>/<td> strip to spaces (collapsed); the
        # closing block tags' newlines are trailing and trim away
        "bold and spanpy emphasized linked cell",
        "",
        1,
    ),
    # no markup passes through
    ("plain text only", "plain text only", "", 0),
    # anchors without href don't count; href in other tags doesn't count
    ('<a name="x">anchor</a> <link href="s.css">', "anchor", "", 0),
    # empty and whitespace-only
    ("", "", "", 0),
    ("   \n\t  ", "", "", 0),
]


def test_extract_hand_cases(spark):
    got = _extract(spark, [c[0] for c in CASES])
    for (html, want_t, want_ti, want_n), (t, ti, n) in zip(CASES, got):
        assert t == want_t, f"text({html!r}) = {t!r}, want {want_t!r}"
        assert ti == want_ti, f"title({html!r}) = {ti!r}, want {want_ti!r}"
        assert n == want_n, f"links({html!r}) = {n}, want {want_n}"


def test_rule_table_is_re2_safe():
    """Every pattern must stay inside the RE2-compatible subset the
    oracle relies on: no backreferences, no lookaround."""
    import re

    for pat, _ in H.STEPS + ((H._LINK_RE, ""), (H._TITLE_RE, "")):
        assert re.search(r"\\[1-9]", pat) is None, f"backreference in {pat!r}"
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat, (
            f"lookaround in {pat!r}"
        )


def test_extraction_is_projection_only(spark):
    """Scale contract: extraction is a narrow scan-time projection —
    the physical plan must contain no Exchange."""
    df = spark.createDataFrame([(1, "<p>a</p>")], "i long, html string")
    out = df.select(H.extract_html_text(F.col("html")).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_link_count_requires_real_href(spark):
    """data-href / xlink:href templating and hreflang must NOT count
    as links (\\bhref matched after '-'/':', hence the explicit \\s in
    _LINK_RE); real href still counts across case and line breaks —
    and the generated DuckDB expression agrees."""
    import duckdb

    html = (
        '<a data-href="/x">a</a><a xlink:href="/y">b</a>'
        '<a hreflang="en" class="z">c</a>'
        '<A HREF="/real1">d</A><a\nhref="/real2">e</a>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    n = df.select(H.html_link_count(F.col("html")).alias("n")).first()["n"]
    assert n == 2
    n_duck = duckdb.execute(
        "SELECT " + H.sql_link_count(H._sql_lit(html))
    ).fetchone()[0]
    assert n_duck == 2
