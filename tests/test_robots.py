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


def test_rules_side_host_folding(spark):
    """ADVICE r12 (medium): a mixed-case or port-suffixed host in the
    ROBOTS corpus must still match its URLs — the r12 form folded only
    the URL side, so 'Example.com' + 'Disallow: /' allowed everything
    (fail-open). Both sides now fold (lowercase + port strip)."""
    texts = {
        "Example.com": "User-agent: *\nDisallow: /\n",
        "b.com:8080": "User-agent: *\nDisallow: /x\n",
    }
    got = _verdicts(
        spark, _rules(spark, texts, "b"),
        ["https://example.com/anything", "https://EXAMPLE.com/y",
         "https://b.com/x/1", "https://b.com:8080/x/2", "https://b.com/y"],
    )
    assert got == {
        "https://example.com/anything": False,
        "https://EXAMPLE.com/y": False,
        "https://b.com/x/1": False,
        "https://b.com:8080/x/2": False,
        "https://b.com/y": True,
    }


def test_literal_backslash_before_star(spark):
    """ADVICE r12 (low): a literal backslash immediately before '*' in
    a rule path mis-compiled under the escape-then-unescape order (the
    unescape consumed the escaped backslash's second char). The rule
    '/a\\*' means literal '/a\\' then any span."""
    texts = {"a.com": "User-agent: *\nDisallow: /a\\*\n"}
    got = _verdicts(
        spark, _rules(spark, texts, "b"),
        ["https://a.com/a\\x", "https://a.com/a\\", "https://a.com/ax"],
    )
    assert got == {
        "https://a.com/a\\x": False,   # backslash then wildcard span
        "https://a.com/a\\": False,    # wildcard spans empty too
        "https://a.com/ax": True,      # no literal backslash -> no match
    }


def test_nul_byte_in_rule_is_literal_not_wildcard(spark):
    """r13 review finding: a NUL byte in a corrupt rule line must
    compile as a LITERAL (matching no real URL path), never collide
    with the wildcard rewrite into a phantom '.*'."""
    texts = {"a.com": "User-agent: *\nDisallow: /a\x00\n"}
    got = _verdicts(
        spark, _rules(spark, texts, "b"),
        ["https://a.com/a", "https://a.com/a/deep", "https://a.com/a\x00b"],
    )
    assert got == {
        "https://a.com/a": True,        # no NUL in the path -> no match
        "https://a.com/a/deep": True,   # a phantom '.*' would flip this
        "https://a.com/a\x00b": False,  # literal NUL prefix DOES match
    }


def test_passthrough_collision_raises(spark):
    """ADVICE r12 (low): internal/output names (__h/__path/__rules/
    crawl_allowed) on the URLS frame would be silently overwritten and
    dropped — refuse them up front (the parse_warc guard, mirrored)."""
    import pytest

    rules = _rules(spark, {"a.com": "User-agent: *\nDisallow: /x\n"}, "b")
    for col in ["__h", "__path", "__rules", "crawl_allowed"]:
        u = spark.createDataFrame(
            [("https://a.com/x", "v")], f"url string, {col} string"
        )
        with pytest.raises(ValueError, match=col.replace("__", "")):
            R.robots_filter(u, rules)


def test_prefix_ua_match_product_token(spark):
    """r13 (VERDICT r12 item 5): ua_match='prefix' — the RFC 9309 /
    Google-matcher rule. A group token selects when it is a
    case-insensitive prefix of the crawler's PRODUCT token (user_agent
    up to '/'); the longest matching token wins; '*' only when no
    token matches; exact mode keeps the r12 semantics."""
    texts = {
        "a.com": (
            "User-agent: examplebot\nDisallow: /private/\n\n"
            "User-agent: example\nDisallow: /public/\n\n"
            "User-agent: *\nDisallow: /\n"
        )
    }
    # crawler 'ExampleBot/1.2' -> product token 'examplebot':
    # both token groups prefix-match; the LONGEST (examplebot) wins.
    rules = _rules_mode(spark, texts, "ExampleBot/1.2", "prefix")
    got = _verdicts(
        spark, rules,
        ["https://a.com/private/x", "https://a.com/public/x",
         "https://a.com/other"],
    )
    assert got == {
        "https://a.com/private/x": False,  # examplebot group applies
        "https://a.com/public/x": True,    # example group must NOT apply
        "https://a.com/other": True,       # star group must NOT apply
    }
    # 'Example/9' -> token 'example': only the shorter group matches.
    rules2 = _rules_mode(spark, texts, "Example/9", "prefix")
    got2 = _verdicts(spark, rules2, ["https://a.com/public/x",
                                     "https://a.com/private/x"])
    assert got2 == {
        "https://a.com/public/x": False,
        "https://a.com/private/x": True,
    }
    # 'OtherBot/2' matches no token -> the star group.
    rules3 = _rules_mode(spark, texts, "OtherBot/2", "prefix")
    assert _verdicts(spark, rules3, ["https://a.com/anything"]) == {
        "https://a.com/anything": False
    }
    # exact mode: 'ExampleBot/1.2' literally names no group -> star.
    rules4 = _rules_mode(spark, texts, "ExampleBot/1.2", "exact")
    assert _verdicts(spark, rules4, ["https://a.com/other"]) == {
        "https://a.com/other": False
    }
    # bad mode rejected
    import pytest

    with pytest.raises(ValueError, match="ua_match"):
        _rules_mode(spark, texts, "x", "fuzzy")


def _rules_mode(spark, texts: dict[str, str], ua: str, mode: str):
    df = spark.createDataFrame(
        list(texts.items()), "host string, robots_txt string"
    )
    return R.parse_robots(df, user_agent=ua, ua_match=mode)


def test_prefix_mode_empty_ua_value_selects_nothing(spark):
    """An empty ``User-agent:`` value is a zero-length prefix of every
    token — it must NOT select (guarded by the length check)."""
    texts = {"a.com": "User-agent:\nDisallow: /\n"}
    rules = _rules_mode(spark, texts, "AnyBot/1", "prefix")
    assert _verdicts(spark, rules, ["https://a.com/x"]) == {
        "https://a.com/x": True
    }


def test_shuffle_fallback_path(spark):
    """r13 scale knob (VERDICT r12 item 3): broadcast=False swaps the
    rule-frame join to a host-keyed SHUFFLED hash join — same
    verdicts, and the plan shows a ShuffledHashJoin with no broadcast
    of the rule frame and still no url-keyed exchange."""
    texts = {"a.com": "User-agent: *\nDisallow: /x\n"}
    rules = _rules(spark, texts, "b")
    urls = spark.range(500).select(
        F.concat(F.lit("https://a.com/x/"), F.col("id")).alias("url")
    )
    out = R.robots_filter(urls, rules, broadcast=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # the corpus may shuffle on the folded host (__h), never on url
    bad = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "url#" in l and "__h" not in l
    ]
    assert not bad, bad
    assert out.filter(~F.col("crawl_allowed")).count() == 500


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


def test_discovery_to_compliance_ladder_composition(spark):
    """r13 discovery->compliance composition (the q189 content-path
    twin): robots_sitemaps finds the seed, sitemap_frontier walks a
    2-level tree to page locs, canonicalize_url folds the crawled
    variants, and robots_filter resolves the CANONICAL urls against
    the SAME robots corpus the seeds came from — the full discovery
    loop closed over one host, every handoff live."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U

    robots_txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Sitemap: https://a.com/index.xml\n"
    )
    robots_df = spark.createDataFrame(
        [("A.com:443", robots_txt)], "host string, robots_txt string"
    )
    seeds = R.robots_sitemaps(robots_df).withColumnRenamed(
        "sitemap_url", "sitemap_url"
    )
    fetched = spark.createDataFrame(
        [
            ("https://a.com/index.xml",
             "<sitemapindex><sitemap><loc>https://a.com/c.xml</loc>"
             "</sitemap></sitemapindex>"),
            ("https://a.com/c.xml",
             "<urlset>"
             "<url><loc>HTTPS://A.COM:443/private/x?b=2&amp;a=1</loc></url>"
             "<url><loc>https://a.com/pub/y/</loc></url>"
             "</urlset>"),
        ],
        "url string, xml string",
    )
    pages = U.sitemap_frontier(fetched, seeds)
    canon = pages.select(
        U.canonicalize_url(F.col("loc")).alias("canon_url"), "depth"
    )
    rules = R.parse_robots(robots_df, user_agent="AnyBot/1", ua_match="prefix")
    out = {
        r["canon_url"]: (r["crawl_allowed"], r["depth"])
        for r in R.robots_filter(canon, rules, url_col="canon_url").collect()
    }
    # entity-decoded loc canonicalized (host fold, :443 strip, param
    # sort) and THEN matched against the folded 'A.com:443' rules key
    assert out == {
        "https://a.com/private/x?a=1&b=2": (False, 1),
        "https://a.com/pub/y": (True, 1),
    }


def test_parse_crawl_delay_group_scoped(spark):
    """r13 politeness: Crawl-delay is group-scoped like the rules —
    the selected group's delay wins, non-numeric/negative values drop
    (one malformed line cannot fail a scan), multiple selected delays
    take the conservative MAX, hosts without a valid delay are
    absent."""
    texts = {
        "a.com": (
            "User-agent: examplebot\nCrawl-delay: 0.5\nDisallow: /x\n\n"
            "User-agent: *\nCrawl-delay: 9\n"
        ),
        "b.com": "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 2\n",
        "c.com": "User-agent: *\nDisallow: /x\n",          # no delay
        "d.com": "User-agent: otherbot\nCrawl-delay: 3\n",  # unselected
        "e.com": "User-agent: *\nCrawl-delay: -1\n",        # negative drops
    }
    df = spark.createDataFrame(list(texts.items()), "host string, robots_txt string")
    got = {
        r["host"]: r["crawl_delay"]
        for r in R.parse_crawl_delay(
            df, user_agent="ExampleBot/1.2", ua_match="prefix"
        ).collect()
    }
    assert got == {"a.com": 0.5, "b.com": 2.0}


def test_crawl_delay_line_splits_ua_run(spark):
    """RFC grammar corner refined by the r13 shared assembly: a
    crawl-delay line between two User-agent lines ENDS the first
    group's UA run, so the second UA line opens a NEW group."""
    texts = {"a.com": (
        "User-agent: alpha\nCrawl-delay: 1\n"
        "User-agent: beta\nDisallow: /x\n"
    )}
    # beta's group holds the rule; alpha's does not
    got_beta = _verdicts(spark, _rules(spark, texts, "beta"), ["https://a.com/x/1"])
    got_alpha = _verdicts(spark, _rules(spark, texts, "alpha"), ["https://a.com/x/1"])
    assert got_beta == {"https://a.com/x/1": False}
    assert got_alpha == {"https://a.com/x/1": True}
    # and the delay belongs to alpha's group only
    df = spark.createDataFrame(list(texts.items()), "host string, robots_txt string")
    assert {r["host"]: r["crawl_delay"]
            for r in R.parse_crawl_delay(df, user_agent="alpha").collect()} == {"a.com": 1.0}
    assert R.parse_crawl_delay(df, user_agent="beta").count() == 0


def test_crawl_schedule_slots_and_offsets(spark):
    """Per-host slots in url order, offset = slot x delay, default
    where a host declares none, delay-table host folded, collision
    guard, order_col override."""
    import pytest

    delays = spark.createDataFrame(
        [("A.com:443", 0.5), ("b.com", 2.0)], "host string, crawl_delay double"
    )
    urls = spark.createDataFrame(
        [("https://a.com/p2",), ("https://a.com/p1",), ("https://A.COM/p3",),
         ("https://b.com/q1",), ("https://nodelay.com/r1",), ("https://nodelay.com/r2",)],
        "url string",
    )
    got = {
        r["url"]: (r["slot"], r["fetch_offset_s"])
        for r in R.crawl_schedule(urls, delays).collect()
    }
    assert got == {
        # folded host groups the case variants into ONE slot sequence;
        # raw-url ASCII order puts the uppercase spelling first
        "https://A.COM/p3": (0, 0.0),
        "https://a.com/p1": (1, 0.5),
        "https://a.com/p2": (2, 1.0),
        "https://b.com/q1": (0, 0.0),
        "https://nodelay.com/r1": (0, 0.0),
        "https://nodelay.com/r2": (1, 1.0),  # default_delay = 1.0
    }
    # order_col overrides url order within the host (tie-break by url)
    prio = spark.createDataFrame(
        [("https://a.com/p1", 2), ("https://a.com/p2", 1)],
        "url string, rank int",
    )
    got2 = {
        r["url"]: r["slot"]
        for r in R.crawl_schedule(prio, delays, order_col="rank").collect()
    }
    assert got2 == {"https://a.com/p2": 0, "https://a.com/p1": 1}
    with pytest.raises(ValueError, match="slot"):
        R.crawl_schedule(
            spark.createDataFrame([("u", 1)], "url string, slot int"), delays
        )


def test_parse_crawl_delay_rejects_nan_and_infinity(spark):
    """r13 review finding: try_cast accepts 'NaN' and 'Infinity', NaN
    compares >= 0 TRUE in Spark, and max() prefers NaN — either would
    poison the whole host's schedule. Both must drop like any other
    malformed value."""
    texts = {
        "a.com": "User-agent: *\nCrawl-delay: NaN\nCrawl-delay: 2\n",
        "b.com": "User-agent: *\nCrawl-delay: Infinity\n",
    }
    df = spark.createDataFrame(list(texts.items()), "host string, robots_txt string")
    got = {r["host"]: r["crawl_delay"]
           for r in R.parse_crawl_delay(df).collect()}
    assert got == {"a.com": 2.0}


def test_crawl_schedule_collapses_fold_equal_delay_rows(spark):
    """r13 review finding: parse_crawl_delay keys by the RAW host, so
    a real corpus can emit 'A.com:443' and 'a.com' as separate delay
    rows that fold to one key — the join must collapse them (max),
    never fan the corpus out and scramble slots."""
    delays = spark.createDataFrame(
        [("A.com:443", 0.5), ("a.com", 2.0)], "host string, crawl_delay double"
    )
    urls = spark.createDataFrame(
        [("https://a.com/p1",), ("https://a.com/p2",)], "url string"
    )
    rows = R.crawl_schedule(urls, delays).collect()
    assert len(rows) == 2  # no fan-out
    got = {r["url"]: (r["slot"], r["fetch_offset_s"]) for r in rows}
    assert got == {
        "https://a.com/p1": (0, 0.0),
        "https://a.com/p2": (1, 2.0),  # conservative max of the two
    }


def test_crawl_schedule_max_urls_per_host_guard(spark):
    """r14 (VERDICT r13 obs. 1): the max_urls_per_host guard bounds
    the schedule per host; the partition histogram demonstrates WHY
    the docstring still points skewed frontiers at domain_cap — the
    slot window's one shuffle concentrates a pathological single-host
    frontier on one key whether or not the output is capped."""
    import pytest

    delays = spark.createDataFrame([("hot.com", 0.5)], "host string, crawl_delay double")
    hot = [(f"https://hot.com/p{i:05d}",) for i in range(2000)]
    cold = [(f"https://site{i}.com/x",) for i in range(50)]
    urls = spark.createDataFrame(hot + cold, "url string")

    out = R.crawl_schedule(urls, delays, max_urls_per_host=3)
    rows = out.collect()
    per_host = {}
    for r in rows:
        h = r["url"].split("/")[2]
        per_host.setdefault(h, []).append(r["slot"])
    # every host bounded at 3 slots, numbered 0..min(n,3)-1, and the
    # hot host keeps its FIRST urls by the schedule order
    assert sorted(per_host["hot.com"]) == [0, 1, 2]
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 3
               for v in per_host.values())
    kept_hot = sorted(r["url"] for r in rows if "hot.com" in r["url"])
    assert kept_hot == [f"https://hot.com/p{i:05d}" for i in range(3)]

    # q168-style partition histogram over the window's shuffle key:
    # the hot host's 2000 rows land in ONE hash partition — the cap
    # truncates output AFTER ranking, it does not spread the key.
    import pyspark.sql.functions as F

    hist = (
        urls.withColumn("__h", F.regexp_extract("url", "https://([^/]+)/", 1))
        .repartition(8, "__h")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert max(r["count"] for r in hist) >= 2000

    with pytest.raises(ValueError, match="max_urls_per_host"):
        R.crawl_schedule(urls, delays, max_urls_per_host=0)
