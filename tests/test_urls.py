"""Adversarial tests for URL canonicalization + keeper dedup (r11 —
VERDICT r10 item 2's prescribed pytest: case, ports, param order,
fragments, plus the tracking scrub, trailing slashes, and the
schemeless pass-through)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(i, u) for i, u in enumerate(raw)], "i long, url string")
    rows = (
        df.select("i", U.canonicalize_url(F.col("url")).alias("c"))
        .orderBy("i")
        .collect()
    )
    return [r["c"] for r in rows]


CASES = [
    # (input, expected canonical)
    ("http://Example.COM/Path", "http://example.com/Path"),  # host folds, path doesn't
    ("HTTP://example.com/a", "http://example.com/a"),  # scheme folds
    ("http://example.com:80/a", "http://example.com/a"),  # http default port
    ("https://example.com:443/a", "https://example.com/a"),  # https default port
    ("http://example.com:443/a", "http://example.com:443/a"),  # NON-default kept
    ("https://example.com:80/a", "https://example.com:80/a"),  # NON-default kept
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # explicit port kept
    ("http://example.com/a#frag", "http://example.com/a"),  # fragment stripped
    ("http://example.com/a?x=1#frag", "http://example.com/a?x=1"),
    ("http://example.com", "http://example.com/"),  # empty path -> /
    ("http://example.com/", "http://example.com/"),
    ("http://example.com///", "http://example.com/"),  # all trailing slashes
    ("http://example.com/a/b/", "http://example.com/a/b"),  # trailing slash stripped
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),  # params sorted
    (
        "http://example.com/a?b=2&utm_source=x&a=1",
        "http://example.com/a?a=1&b=2",
    ),  # utm_* scrubbed
    (
        "http://example.com/a?utm_campaign=y&fbclid=z&gclid=w",
        "http://example.com/a",
    ),  # query emptied by scrub drops its '?'
    ("http://example.com/a?", "http://example.com/a"),  # empty query
    ("http://example.com/a?_ga=1.2&x=3", "http://example.com/a?x=3"),
    ("http://example.com/a?fbclid", "http://example.com/a"),  # bare tracking key
    ("http://example.com/a?refresh=1", "http://example.com/a?refresh=1"),  # not tracking
    ("  http://example.com/a  ", "http://example.com/a"),  # trimmed
    ("not a url", "not a url"),  # schemeless: pass-through (trim+defrag only)
    ("/relative/path?utm_source=x", "/relative/path?utm_source=x"),
]


def test_canonicalize_adversarial_cases(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for (inp, want), g in zip(CASES, got):
        assert g == want, f"canonicalize({inp!r}) = {g!r}, want {want!r}"


# r12 — RFC 3986 §6.2.2.1–2 percent-encoding normalization (ADVICE r11):
# hex case folds UP, unreserved octets decode, reserved octets stay
# encoded, malformed escapes pass through.
PCT_CASES = [
    ("http://h/%7euser", "http://h/~user"),  # lowercase hex, unreserved
    ("http://h/%7Euser", "http://h/~user"),  # uppercase hex, unreserved
    ("http://h/a%2fb", "http://h/a%2Fb"),  # reserved '/': fold hex, keep encoded
    ("http://h/a%2Fb", "http://h/a%2Fb"),
    ("http://h/%41%42c", "http://h/ABc"),  # consecutive decodes
    ("http://h/p?z=%7ex", "http://h/p?z=~x"),  # query side too
    ("http://h/p?q=100%20off", "http://h/p?q=100%20off"),  # space: reserved-ish, kept
    ("http://h/p%zz", "http://h/p%zz"),  # malformed escape: untouched
    ("http://h/p%", "http://h/p%"),  # trailing stray '%'
    ("http://h/%2e%2e/a", "http://h/../a"),  # '.' decodes ('..' segments are the
    # documented trade: dot-segment resolution needs a base, out of scope)
    ("http://h/p?a=%3D1", "http://h/p?a=%3D1"),  # '=' stays encoded: no re-split
]


def test_pct_normalization_cases(spark):
    got = _canon(spark, [c[0] for c in PCT_CASES])
    for (inp, want), g in zip(PCT_CASES, got):
        assert g == want, f"canonicalize({inp!r}) = {g!r}, want {want!r}"


def test_pct_normalization_matches_python_reference(spark):
    """The split-on-%% expression against a direct Python reference of
    the same rule, over strings stressing every branch interaction
    (double %%, escape at string start/end, hex-lookalike after a
    malformed escape)."""
    import re

    def ref(s: str) -> str:
        def sub(m):
            hx = m.group(1).upper()
            return U.UNRESERVED_BY_HEX.get(hx, "%" + hx)

        return re.sub(r"%([0-9A-Fa-f]{2})", sub, s)

    inputs = [
        "%41", "x%41", "%41x", "%", "%%", "%%41", "a%%41b", "%4", "%4g",
        "%zz%7e", "%2f%2F%7e%7E", "plain", "", "%41%zz%42", "100%25off",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(inputs)], "i long, s string"
    )
    rows = (
        df.select("i", "s", U.pct_normalize(F.col("s")).alias("n"))
        .orderBy("i")
        .collect()
    )
    for r in rows:
        assert r["n"] == ref(r["s"]), f"pct_normalize({r['s']!r}) = {r['n']!r}"


def test_canonicalize_is_idempotent(spark):
    """Canonicalization must be a projection onto its own image:
    canonicalize(canonicalize(u)) == canonicalize(u) for every input —
    the invariant that makes canonical URLs safe as join/dedup keys
    (re-canonicalizing a stored key can never change it). Stressed
    over a seeded generator mixing every rule: case, ports, fragments,
    tracking params, percent-escapes (reserved, unreserved, malformed),
    slashes, and junk."""
    import random

    rng = random.Random(7)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["Example.COM", "a.b.co.uk", "X.Y", "h"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b/", "/%70age", "/a%2fb", "/p%ZZq", "/x%", "//y//"]
    params = ["a=1", "B=%7e", "utm_source=x", "fbclid=Q", "z=%2F", "m", ""]
    urls = []
    for i in range(200):
        q = "&".join(rng.sample(params, rng.randrange(0, len(params))))
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + (("?" + q) if q else "")
            + (("#f" + str(i)) if rng.random() < 0.3 else "")
        )
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, u string")
    once = U.canonicalize_url(F.col("u"))
    rows = (
        df.select("i", "u", once.alias("c1"))
        .select("i", "u", "c1", U.canonicalize_url(F.col("c1")).alias("c2"))
        .filter(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert not rows, [(r["u"], r["c1"], r["c2"]) for r in rows[:5]]


def test_sql_pct_normalize_matches_spark(spark):
    """Engine-portability of the GENERATED oracle expression (the q179
    contract): DuckDB's replay must equal the Spark column for every
    adversarial input."""
    import duckdb

    inputs = [c[0] for c in PCT_CASES] + [
        "%41", "%%41", "%", "%4g", "%2f%7e", "", "plain",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(inputs)], "i long, s string"
    )
    got_spark = [
        r["n"]
        for r in df.select("i", U.pct_normalize(F.col("s")).alias("n"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    expr = U.sql_pct_normalize("s")
    got_duck = [
        con.execute(f"SELECT {expr} AS n FROM (SELECT ? AS s)", [s]).fetchone()[0]
        for s in inputs
    ]
    assert got_spark == got_duck, list(zip(inputs, got_spark, got_duck))


def test_case_fold_is_scheme_and_host_only(spark):
    # Path and query case is significant and must survive.
    [c] = _canon(spark, ["HTTPS://WWW.Example.Com:443/CaseSensitive?Key=Val"])
    assert c == "https://www.example.com/CaseSensitive?Key=Val"


def test_extra_tracking_params(spark):
    df = spark.createDataFrame(
        [(1, "http://h/p?sid=9&x=1")], "i long, url string"
    )
    default = df.select(U.canonicalize_url(F.col("url")).alias("c")).first()["c"]
    extended = df.select(
        U.canonicalize_url(F.col("url"), extra_tracking=("sid",)).alias("c")
    ).first()["c"]
    assert default == "http://h/p?sid=9&x=1"
    assert extended == "http://h/p?x=1"


def test_keeper_dedup_argmax_and_tiebreak(spark):
    rows = [
        # group A: three variants of one URL, quality picks id 2
        (1, "http://a.com/x?p=1&q=2", 10),
        (2, "HTTP://A.com:80/x/?q=2&utm_source=s&p=1#f", 90),
        (3, "http://a.com/x?q=2&p=1&fbclid=z", 50),
        # group B: quality tie -> min id (4) wins
        (4, "https://b.com/y", 7),
        (5, "https://b.com:443/y/", 7),
        # group C: singleton always kept
        (6, "http://c.com/z", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, qual long")
    kept = U.url_keeper_dedup(df, "url", "doc_id", "qual")
    got = {r["doc_id"]: r["canon_url"] for r in kept.collect()}
    assert sorted(got) == [2, 4, 6]
    assert got[2] == "http://a.com/x?p=1&q=2"
    assert got[4] == "https://b.com/y"
    # all input columns survive
    assert set(kept.columns) == {"doc_id", "url", "qual", "canon_url"}


def test_keeper_dedup_single_shuffle(spark):
    """Canonicalization is a projection: the physical plan must show
    exactly one Exchange (the keeper window's hash partition)."""
    df = spark.createDataFrame(
        [(1, "http://a.com/x", 1), (2, "http://a.com/x?utm_source=s", 2)],
        "doc_id long, url string, qual long",
    )
    plan = U.url_keeper_dedup(df, "url", "doc_id", "qual")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_parse_sitemap_grammar_corners(spark):
    """r12 discovery layer: <url> must not match <urlset> and
    <sitemap> must not match <sitemapindex> (the \\b anchor); both
    kinds parse in one pass; namespace declarations are inert
    attributes; loc whitespace trims; entities decode with &amp; LAST
    (&amp;lt; is the literal text &lt;); entries without a loc drop;
    non-numeric priority comes back NULL instead of failing; and
    passthrough columns survive the explode."""
    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>  https://a/1?x=1&amp;y=2  </loc><priority>0.5</priority></url>"
        "<url><loc>https://a/amp?e=&amp;lt;</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc -> dropped
        "<url><loc>https://a/badprio</loc><priority>high</priority></url>"
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("h1", xml), ("h2", idx)], "src string, xml string"
    )
    rows = {
        r["loc"]: r
        for r in U.parse_sitemap(df).collect()
    }
    assert set(rows) == {
        "https://a/1?x=1&y=2", "https://a/amp?e=&lt;",
        "https://a/badprio", "https://a/s1.xml",
    }
    assert rows["https://a/1?x=1&y=2"]["priority"] == 0.5
    assert rows["https://a/1?x=1&y=2"]["src"] == "h1"  # passthrough
    assert rows["https://a/badprio"]["priority"] is None  # try-cast, no crash
    assert rows["https://a/s1.xml"]["kind"] == "sitemap"
    assert rows["https://a/amp?e=&lt;"]["kind"] == "url"


def test_registered_domain_heuristic(spark):
    cases = [
        ("http://www.example.com/x", "example.com"),
        ("http://example.com/x", "example.com"),
        ("http://a.b.c.example.com/x", "example.com"),
        ("http://a.b.co.uk/x", "b.co.uk"),  # two-level suffix -> 3 labels
        ("http://cdn.static.d2.com.au/p", "d2.com.au"),
        ("http://co.uk/x", "co.uk"),  # bare suffix: only 2 labels exist
        ("http://localhost/x", "localhost"),  # single label passes whole
        ("HTTPS://WWW.Example.COM:8443/x", "example.com"),  # folded, port off
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = [
        r["d"]
        for r in df.select("i", U.registered_domain(F.col("url")).alias("d"))
        .orderBy("i")
        .collect()
    ]
    for (inp, want), g in zip(cases, got):
        assert g == want, f"registered_domain({inp!r}) = {g!r}, want {want!r}"


def test_domain_blocklist_filter_blocks_subdomains(spark):
    rows = [
        (1, "http://evil.com/a"),
        (2, "http://cdn.evil.com/b"),  # subdomain dies with parent
        (3, "http://good.com/c"),
        (4, "http://evil.co.uk/d"),  # different registered domain — survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("evil.com",)], "domain string")
    kept = {r["doc_id"] for r in U.domain_blocklist_filter(df, "url", bl).collect()}
    assert kept == {3, 4}


def test_domain_cap_keeps_best_quality(spark):
    rows = [
        (1, "http://a.com/1", 10),
        (2, "http://www.a.com/2", 30),  # same domain via subdomain
        (3, "http://a.com/3", 20),
        (4, "http://b.com/4", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, qual long")
    kept = {r["doc_id"] for r in U.domain_cap(df, "url", "doc_id", "qual", cap=2).collect()}
    assert kept == {2, 3, 4}  # a.com keeps the two best; b.com under cap


def test_extra_tracking_names_are_literal(spark):
    """extra_tracking names are LITERALS: a regex metacharacter in a
    name must not widen the scrub (``a.b`` matching ``aXb``) or split
    the alternation (``s|id`` scrubbing every ``s`` and ``id``)."""
    df = spark.createDataFrame(
        [(1, "http://h/p?a.b=1&aXb=2&s=3&id=4&x=5")], "i long, url string"
    )
    got = df.select(
        U.canonicalize_url(F.col("url"), extra_tracking=("a.b", "s|id")).alias("c")
    ).first()["c"]
    # Only the literal "a.b" param dies; aXb, s, id, x all survive
    # (the literal name "s|id" matches no param here).
    assert got == "http://h/p?aXb=2&id=4&s=3&x=5"


def test_domain_cap_reuses_existing_domain_column(spark):
    """A caller-derived ``domain`` column (e.g. exact PSL) is respected
    — domain_cap must cap by it, not overwrite it with the heuristic
    (and the blocklist→cap composition computes the regex chain once)."""
    rows = [
        (1, "http://a.com/1", 10, "custom.dom"),
        (2, "http://b.com/2", 5, "custom.dom"),  # heuristic would split these
        (3, "http://c.com/3", 7, "other.dom"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, qual long, domain string")
    kept = U.domain_cap(df, "url", "doc_id", "qual", cap=1).collect()
    assert {r["doc_id"] for r in kept} == {1, 3}
    assert all(r["domain"] in ("custom.dom", "other.dom") for r in kept)


def test_registered_domain_psl_all_rule_forms(spark):
    """Exact-PSL swap: literal, wildcard, and exception rules resolve
    per the published algorithm (exception beats wildcard, longest
    literal wins, default rule = last label), bare-suffix and
    single-label hosts pass through whole, and the output column drops
    into domain_cap unchanged (the promised swap discipline)."""
    psl = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("*.ck",), ("!www.ck",)], "rule string"
    )
    rows = [
        (1, "http://a.b.co.uk/x"),   # longest literal: co.uk -> b.co.uk
        (2, "http://sub.a.com/x"),   # com -> a.com
        (3, "http://x.foo.ck/x"),    # wildcard *.ck -> foo.ck suffix -> x.foo.ck
        (4, "http://www.ck/x"),      # exception !www.ck -> suffix ck -> www.ck
        (5, "http://deep.x.foo.ck/x"),  # wildcard suffix, deeper host -> x.foo.ck
        (6, "http://co.uk/x"),       # host IS a public suffix -> whole
        (7, "http://localhost/x"),   # single label -> whole
        (8, "http://a.example/x"),   # no rule: default -> last two labels
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["domain"]
        for r in U.registered_domain_psl(df, "url", "doc_id", psl).collect()
    }
    assert got == {
        1: "b.co.uk",
        2: "a.com",
        3: "x.foo.ck",
        4: "www.ck",
        5: "x.foo.ck",
        6: "co.uk",
        7: "localhost",
        8: "a.example",
    }
    # swap discipline: the exact domain column is REUSED by domain_cap
    capped = U.domain_cap(
        U.registered_domain_psl(
            df.withColumn("qual", F.col("doc_id")), "url", "doc_id", psl
        ),
        "url", "doc_id", "qual", cap=1,
    )
    by_dom = {r["domain"] for r in capped.collect()}
    assert "x.foo.ck" in by_dom  # docs 3 and 5 collapsed under one exact domain
    assert capped.filter(F.col("domain") == "x.foo.ck").count() == 1


def test_registered_domain_psl_broadcasts_rules(spark):
    """Scale contract: the PSL side must be broadcast — no shuffle of
    the corpus for rule matching (the host-keyed aggregate is the one
    allowed exchange)."""
    psl = spark.createDataFrame([("com",)], "rule string")
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = (
        U.registered_domain_psl(df, "url", "doc_id", psl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_registered_domain_psl_whole_host_rules(spark):
    """Rules matching the ENTIRE host must participate in resolution
    (review finding): an exception rule usually matches the whole
    host, a host may BE a listed suffix, and a wildcard can cover the
    whole host — all three previously fell outside the candidate set."""
    psl = spark.createDataFrame(
        [("jp",), ("*.kawasaki.jp",), ("!city.kawasaki.jp",),
         ("com",), ("s3.amazonaws.com",), ("io",), ("*.foo.io",)],
        "rule string",
    )
    rows = [
        (1, "http://city.kawasaki.jp/x"),   # exception on whole host
        (2, "http://a.city.kawasaki.jp/x"), # exception suffix + one label... see below
        (3, "http://foo.kawasaki.jp/x"),    # wildcard makes host a suffix -> whole
        (4, "http://s3.amazonaws.com/x"),   # host IS a listed suffix -> whole
        (5, "http://b.s3.amazonaws.com/x"), # one label above the listed suffix
        (6, "http://x.foo.io/x"),           # wildcard suffix covers whole host
        (7, "http://d.x.foo.io/x"),         # suffix is x.foo.io (the * ate x)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["domain"]
        for r in U.registered_domain_psl(df, "url", "doc_id", psl).collect()
    }
    assert got == {
        1: "city.kawasaki.jp",     # !city.kawasaki.jp -> suffix kawasaki.jp
        2: "city.kawasaki.jp",     # registered domain of its subdomain
        3: "foo.kawasaki.jp",      # public suffix itself -> pass whole
        4: "s3.amazonaws.com",     # public suffix itself -> pass whole
        5: "b.s3.amazonaws.com",
        6: "x.foo.io",             # public suffix itself -> pass whole
        7: "d.x.foo.io",           # suffix x.foo.io + one label
    }


def test_registered_domain_psl_requires_unique_ids(spark):
    """Duplicate ids would merge rule matches across rows and fan out
    under the rejoin — guarded by default, bypassable when uniqueness
    holds by construction."""
    import pytest as _pytest

    psl = spark.createDataFrame([("com",)], "rule string")
    df = spark.createDataFrame(
        [(7, "http://a.b.co.uk/x"), (7, "http://sub.a.com/y")],
        "doc_id long, url string",
    )
    with _pytest.raises(ValueError, match="not unique"):
        U.registered_domain_psl(df, "url", "doc_id", psl)


def test_domain_blocklist_reuses_existing_domain_column(spark):
    """The blocklist must match a caller-derived domain (exact PSL)
    as-is instead of overwriting it with the heuristic — the swap
    discipline domain_cap already honors (review finding)."""
    psl = spark.createDataFrame([("io",), ("*.foo.io",)], "rule string")
    rows = [(1, "http://x.foo.io/a"), (2, "http://y.foo.io/a"), (3, "http://z.bar.io/a")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    exact = U.registered_domain_psl(df, "url", "doc_id", psl)
    bl = spark.createDataFrame([("x.foo.io",)], "domain string")
    kept = U.domain_blocklist_filter(exact, "url", bl).collect()
    # Under the heuristic both foo.io hosts share domain "foo.io" and
    # the x.foo.io entry would match nothing; with the exact column
    # reused, exactly doc 1 dies.
    assert {r["doc_id"] for r in kept} == {2, 3}
    assert {r["domain"] for r in kept} == {"y.foo.io", "bar.io"}


def test_sitemap_frontier_two_level_walk(spark):
    """r13 frontier walk (VERDICT r12 item 4): a planted 2-level tree
    — index -> two child urlsets — resolves seeds against the fetched
    table level by level; page entries carry the level they were found
    at; unfetched children resolve to nothing; a child shared by two
    indexes parses ONCE (visited guard)."""
    fetched = spark.createDataFrame(
        [
            ("https://a.com/index.xml",
             "<sitemapindex>"
             "<sitemap><loc>https://a.com/c1.xml</loc></sitemap>"
             "<sitemap><loc>https://a.com/c2.xml</loc></sitemap>"
             "<sitemap><loc>https://a.com/missing.xml</loc></sitemap>"
             "</sitemapindex>"),
            ("https://b.com/index.xml",
             "<sitemapindex>"
             "<sitemap><loc>https://a.com/c2.xml</loc></sitemap>"
             "</sitemapindex>"),
            ("https://a.com/c1.xml",
             "<urlset><url><loc>https://a.com/p1</loc></url>"
             "<url><loc>https://a.com/p2</loc></url></urlset>"),
            ("https://a.com/c2.xml",
             "<urlset><url><loc>https://a.com/p3</loc></url></urlset>"),
        ],
        "url string, xml string",
    )
    seeds = spark.createDataFrame(
        [("a.com", "https://a.com/index.xml"), ("b.com", "https://b.com/index.xml")],
        "host string, sitemap_url string",
    )
    out = U.sitemap_frontier(fetched, seeds).collect()
    got = {(r["loc"], r["depth"], r["source_sitemap"]) for r in out}
    assert got == {
        ("https://a.com/p1", 1, "https://a.com/c1.xml"),
        ("https://a.com/p2", 1, "https://a.com/c1.xml"),
        ("https://a.com/p3", 1, "https://a.com/c2.xml"),
    }
    assert len(out) == 3  # shared c2 child walked once, not twice


def test_sitemap_frontier_cycle_and_depth_bound(spark):
    """A cyclic index (a -> b -> a) must terminate via the visited
    guard; max_depth caps the walk even on a deeper chain."""
    fetched = spark.createDataFrame(
        [
            ("s://i1", "<sitemapindex><sitemap><loc>s://i2</loc></sitemap>"
                       "</sitemapindex>"),
            ("s://i2", "<sitemapindex><sitemap><loc>s://i1</loc></sitemap>"
                       "<sitemap><loc>s://u1</loc></sitemap></sitemapindex>"),
            ("s://u1", "<urlset><url><loc>s://p1</loc></url></urlset>"),
        ],
        "url string, xml string",
    )
    seeds = spark.createDataFrame([("h", "s://i1")], "host string, sitemap_url string")
    out = U.sitemap_frontier(fetched, seeds, max_depth=5).collect()
    assert {(r["loc"], r["depth"]) for r in out} == {("s://p1", 2)}
    # depth bound: stop BEFORE the urlset level -> no pages at all
    shallow = U.sitemap_frontier(fetched, seeds, max_depth=2)
    assert shallow.count() == 0
    # empty seeds: empty frame with the stable schema
    empty = U.sitemap_frontier(
        fetched, seeds.filter("host = 'nope'"))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "source_sitemap", "loc", "lastmod", "changefreq", "priority", "depth"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_depth"):
        U.sitemap_frontier(fetched, seeds, max_depth=0)


def test_read_sitemap_files_gzip(spark, tmp_path):
    """r13 gzip half: .xml.gz sitemap files decompress transparently
    through the text source's codec dispatch (wholetext — one row per
    file), and the file column maps back to the source path; plain
    .xml files read through the same call."""
    import gzip as _gzip

    (tmp_path / "plain.xml").write_text(
        "<urlset><url><loc>s://plain</loc></url></urlset>")
    with _gzip.open(tmp_path / "zipped.xml.gz", "wt", encoding="utf-8") as fh:
        fh.write("<urlset><url><loc>s://zipped</loc></url></urlset>")
    df = U.read_sitemap_files(spark, str(tmp_path))
    rows = {r["file"].split("/")[-1]: r["xml"] for r in df.collect()}
    assert set(rows) == {"plain.xml", "zipped.xml.gz"}
    assert "s://zipped" in rows["zipped.xml.gz"]
    # and the output composes straight into the frontier walk
    fetched = df.select(
        F.concat(F.lit("https://x.com/"),
                 F.element_at(F.split("file", "/"), -1)).alias("url"), "xml")
    seeds = spark.createDataFrame(
        [("h", "https://x.com/zipped.xml.gz")], "host string, sitemap_url string")
    out = U.sitemap_frontier(fetched, seeds).collect()
    assert [(r["loc"], r["depth"]) for r in out] == [("s://zipped", 0)]
