"""robots.txt parsing + compliance filtering tests (r12) — RFC 9309
semantics pinned by hand: group selection, wildcard/$ compilation,
longest-match resolution, Allow-wins-ties, and the default-allow
fallbacks. The q186 oracle is a planted truth table; these cases cover
the grammar corners the grid doesn't."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import robots as R


def _rules(spark, texts: dict[str, str], ua: str):
    df = spark.createDataFrame(
        list(texts.items()), "host string, robots_txt string"
    )
    return R.parse_robots(df, user_agent=ua)


def _verdicts(spark, rules, urls: list[str]) -> dict[str, bool]:
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r["url"]: r["crawl_allowed"]
        for r in R.robots_filter(u, rules).collect()
    }


def test_group_selection_specific_beats_star(spark):
    """A host with BOTH a UA-specific group and a catch-all: the UA
    group's rules apply and the star group's are ignored entirely —
    and vice versa for a UA the file doesn't name."""
    texts = {
        "a.com": (
            "User-agent: trainbot\nDisallow: /private/\n\n"
            "User-agent: *\nDisallow: /\n"
        )
    }
    got = _verdicts(
        spark, _rules(spark, texts, "trainbot"),
        ["https://a.com/private/x", "https://a.com/public"],
    )
    assert got == {
        "https://a.com/private/x": False,
        "https://a.com/public": True,  # star's Disallow: / must NOT apply
    }
    other = _verdicts(
        spark, _rules(spark, texts, "unnamedbot"), ["https://a.com/public"]
    )
    assert other == {"https://a.com/public": False}  # falls to the star group


def test_multiple_user_agent_lines_share_one_group(spark):
    texts = {"a.com": "User-agent: alpha\nUser-agent: beta\nDisallow: /x\n"}
    for ua in ["alpha", "beta"]:
        got = _verdicts(spark, _rules(spark, texts, ua), ["https://a.com/x/1"])
        assert got == {"https://a.com/x/1": False}, ua
    # a third UA selects no group -> allowed
    got = _verdicts(spark, _rules(spark, texts, "gamma"), ["https://a.com/x/1"])
    assert got == {"https://a.com/x/1": True}


def test_directives_case_insensitive_comments_crlf(spark):
    texts = {
        "a.com": "# hdr\nUSER-AGENT: *\r\nDISALLOW: /a # trailing comment\r\n"
                 "Crawl-delay: 10\r\nSitemap: https://a.com/map.xml\r\n"
    }
    rules = _rules(spark, texts, "anybot")
    rows = rules.collect()
    assert [(r["rule_path"], r["allow"]) for r in rows] == [("/a", False)]
    got = _verdicts(spark, rules, ["https://a.com/a/1", "https://a.com/b"])
    assert got == {"https://a.com/a/1": False, "https://a.com/b": True}


def test_wildcard_and_dollar_compilation(spark):
    texts = {
        "a.com": (
            "User-agent: *\n"
            "Disallow: /t/*/end$\n"   # both metachars in one rule
            "Disallow: *.png$\n"
            "Disallow: /lit.[x]\n"    # regex metachars must be LITERAL
        )
    }
    rules = _rules(spark, texts, "b")
    got = _verdicts(
        spark, rules,
        [
            "https://a.com/t/a/end",      # matches the $-anchored wildcard
            "https://a.com/t/a/end/more", # $ must block this
            "https://a.com/img/p.png",    # trailing-anchor wildcard
            "https://a.com/img/p.pngx",   # $ must block this
            "https://a.com/lit.[x]",      # literal dot/brackets
            "https://a.com/litz[x]",      # '.' must not act as regex dot
        ],
    )
    assert got == {
        "https://a.com/t/a/end": False,
        "https://a.com/t/a/end/more": True,
        "https://a.com/img/p.png": False,
        "https://a.com/img/p.pngx": True,
        "https://a.com/lit.[x]": False,
        "https://a.com/litz[x]": True,
    }


def test_longest_match_wins_and_allow_breaks_ties(spark):
    texts = {
        "a.com": (
            "User-agent: *\n"
            "Disallow: /p/\n"
            "Allow: /p/ok\n"     # longer -> overrides
            "Disallow: /q/ab\n"
            "Allow: /q/cd\n"     # equal length, different paths
            "Disallow: /r/xy\n"
            "Allow: /r/xy\n"     # EQUAL length, same match -> Allow wins
        )
    }
    got = _verdicts(
        spark, _rules(spark, texts, "b"),
        ["https://a.com/p/ok/1", "https://a.com/p/no",
         "https://a.com/q/ab1", "https://a.com/q/cd1",
         "https://a.com/r/xy9"],
    )
    assert got == {
        "https://a.com/p/ok/1": True,
        "https://a.com/p/no": False,
        "https://a.com/q/ab1": False,
        "https://a.com/q/cd1": True,
        "https://a.com/r/xy9": True,
    }


def test_empty_disallow_is_allow_all_and_default_allow(spark):
    texts = {"a.com": "User-agent: *\nDisallow:\n"}
    rules = _rules(spark, texts, "b")
    assert rules.count() == 0  # the historical allow-all idiom: no rule
    got = _verdicts(
        spark, rules,
        ["https://a.com/anything", "https://norobots.com/x"],
    )
    assert got == {
        "https://a.com/anything": True,
        "https://norobots.com/x": True,  # host absent from rules entirely
    }


def test_url_host_folding_and_ports(spark):
    """Rules key on the lowercased, port-stripped host — URLs with
    case-varied hosts and explicit ports must still match."""
    texts = {"a.com": "User-agent: *\nDisallow: /x\n"}
    got = _verdicts(
        spark, _rules(spark, texts, "b"),
        ["https://A.COM/x/1", "https://a.com:8443/x/2", "http://a.com/y"],
    )
    assert got == {
        "https://A.COM/x/1": False,
        "https://a.com:8443/x/2": False,
        "http://a.com/y": True,
    }


def test_robots_sitemaps_extraction_and_ladder_composition(spark):
    """r12 connector: Sitemap: directives extract regardless of group
    position (RFC 9309 §2.3 — UA-independent), case-insensitively in
    the NAME but case-preserving in the URL, comments/CRLF stripped,
    empty values dropped — and the output composes straight into
    parse_sitemap (host carried through as provenance)."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U

    texts = {
        "a.com": (
            "Sitemap: https://a.com/TopLevel.xml\r\n"
            "User-agent: *\nDisallow: /x\n"
            "SITEMAP: https://a.com/inside-group.xml # trailing comment\n"
            "sitemap:\n"  # empty value -> dropped
        ),
        "b.com": "User-agent: *\nDisallow: /\n",  # none
    }
    df = spark.createDataFrame(
        list(texts.items()), "host string, robots_txt string"
    )
    got = {
        (r["host"], r["sitemap_url"])
        for r in R.robots_sitemaps(df).collect()
    }
    assert got == {
        ("a.com", "https://a.com/TopLevel.xml"),
        ("a.com", "https://a.com/inside-group.xml"),
    }
    # Composition: pretend we fetched one of them; entries explode with
    # the host still attached.
    fetched = spark.createDataFrame(
        [("a.com", "<urlset><url><loc>https://a.com/p1</loc></url></urlset>")],
        "host string, xml string",
    )
    rows = U.parse_sitemap(fetched).collect()
    assert [(r["host"], r["kind"], r["loc"]) for r in rows] == [
        ("a.com", "url", "https://a.com/p1")
    ]


def test_rule_frame_joins_broadcast_and_corpus_never_shuffles(spark):
    """Scale contract (single-pass form, r12 review): the per-host
    rule-array frame broadcast-joins the corpus and resolution is a
    map-side fold — so the URL side of the plan must contain NO
    exchange at all (the only exchanges belong to the tiny rule-frame
    aggregation), and the join must be broadcast, never sort-merge."""
    texts = {"a.com": "User-agent: *\nDisallow: /x\n"}
    rules = _rules(spark, texts, "b")
    urls = spark.range(1000).select(
        F.concat(F.lit("https://a.com/x/"), F.col("id")).alias("url")
    )
    out = R.robots_filter(urls, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # The rule-frame subtree (tiny, parse_robots' own group joins) may
    # shuffle/sort-merge internally; the URL side must not — no
    # exchange and no sort-merge join may ever touch the url column.
    bad = [
        l
        for l in plan.splitlines()
        if ("Exchange hashpartitioning" in l or "SortMergeJoin" in l)
        and "url#" in l
    ]
    assert not bad, bad
    assert out.filter(~F.col("crawl_allowed")).count() == 1000
