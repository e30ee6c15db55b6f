"""WARC/WET container parsing tests (r11): hand-built records through
read_warc → parse_warc → http_body, composed with q183's HTML
extraction — the full crawl-ladder input path — plus the
projection-only plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import html as H
from apache_hadoop_framework_for_peptide_identification_spark.operators import warc as W


def _warc_bytes() -> str:
    # Three records: warcinfo, an HTTP response wrapping HTML, and a
    # WET-style conversion record with a direct text payload.
    crlf = "\r\n"
    rec1 = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Date: 2026-08-15T00:00:00Z\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "crawl=t01" + crlf + crlf
    )
    html = "<html><head><title>T &amp; U</title></head><body><p>hello world</p></body></html>"
    http = (
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html\r\n"
        "\r\n" + html
    )
    rec2 = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://example.com/a\r\n"
        "WARC-Date: 2026-08-15T00:00:01Z\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n" + http + crlf + crlf
    )
    rec3 = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/b\r\n"
        "WARC-Date: 2026-08-15T00:00:02Z\r\n"
        "\r\n"
        "plain wet text body" + crlf + crlf
    )
    return rec1 + rec2 + rec3


def test_read_and_parse_warc_records(spark, tmp_path):
    p = tmp_path / "sample.warc"
    p.write_text(_warc_bytes())
    raw = W.read_warc(spark, str(p))
    assert raw.count() == 3  # empty pre-marker fragment dropped
    parsed = W.parse_warc(raw).orderBy("warc_date").collect()
    assert [r["warc_type"] for r in parsed] == ["warcinfo", "response", "conversion"]
    assert parsed[0]["target_uri"] == ""  # warcinfo has none
    assert parsed[0]["content_length"] == 9
    assert parsed[0]["payload"] == "crawl=t01"
    assert parsed[1]["target_uri"] == "http://example.com/a"
    assert parsed[1]["payload"].startswith("HTTP/1.1 200 OK")
    assert parsed[2]["content_length"] is None  # absent header -> null
    assert parsed[2]["payload"] == "plain wet text body"


def test_http_body_and_full_ladder_to_clean_text(spark, tmp_path):
    """response payloads lose the HTTP envelope, WET payloads pass
    through, and the body feeds q183's extract_html_text — the full
    WARC → HTML → text ladder in one projection chain."""
    p = tmp_path / "sample.warc"
    p.write_text(_warc_bytes())
    out = (
        W.parse_warc(W.read_warc(spark, str(p)))
        .filter(F.col("warc_type").isin("response", "conversion"))
        .select(
            "target_uri",
            "warc_type",
            W.http_body(F.col("payload")).alias("body"),
        )
        .select(
            "target_uri",
            "warc_type",
            H.extract_html_text(F.col("body")).alias("clean_text"),
            H.html_title(F.col("body")).alias("title"),
        )
        .orderBy("target_uri")
        .collect()
    )
    assert out[0]["clean_text"] == "hello world"
    assert out[0]["title"] == "T & U"
    assert out[1]["clean_text"] == "plain wet text body"  # no tags: unchanged
    assert out[1]["title"] == ""


def test_header_parse_is_case_insensitive_and_first_wins(spark):
    rec = (
        "warc-type: response\r\n"
        "WARC-Target-URI: http://a/1\r\n"
        "WARC-Target-URI: http://a/2\r\n"
        "\r\n"
        "x"
    )
    df = spark.createDataFrame([(rec,)], "record string")
    row = W.parse_warc(df).first()
    assert row["warc_type"] == "response"
    assert row["target_uri"] == "http://a/1"  # first occurrence per spec


def test_parse_warc_is_projection_only(spark):
    """Scale contract: record parsing is a scan-time projection — the
    physical plan must contain no Exchange (the html.py discipline)."""
    df = spark.createDataFrame([("WARC-Type: x\r\n\r\nbody",)], "record string")
    plan = W.parse_warc(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_blank_fragments_are_dropped_not_phantom(spark, tmp_path):
    """A leading blank line (or CRLF-only tail) must not surface as a
    phantom empty record — the fragment filter is whitespace-aware,
    not space-only trim (review finding)."""
    p = tmp_path / "lead.warc"
    p.write_text("\r\n" + "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody\r\n\r\n")
    raw = W.read_warc(spark, str(p))
    assert raw.count() == 1
    assert W.parse_warc(raw).first()["payload"] == "body"


def test_marker_parameter_reads_warc_11(spark, tmp_path):
    """WARC/1.1 files (and re-encoded variants) frame via the marker
    parameter — there is no silent sniffing (documented trade)."""
    p = tmp_path / "v11.warc"
    p.write_text(
        "WARC/1.1\r\nWARC-Type: conversion\r\n\r\nfirst\r\n\r\n"
        "WARC/1.1\r\nWARC-Type: conversion\r\n\r\nsecond\r\n\r\n"
    )
    parsed = W.parse_warc(W.read_warc(spark, str(p), marker="WARC/1.1\r\n"))
    assert [r["payload"] for r in parsed.orderBy("payload").collect()] == [
        "first",
        "second",
    ]


def test_frame_suspect_false_on_well_formed_records(spark, tmp_path):
    """ADVICE r11: the Content-Length cross-check must stay quiet on
    well-formed records — including ones with no Content-Length at all
    (nothing to check) and payloads whose own content ends mid-word."""
    p = tmp_path / "sample.warc"
    p.write_text(_warc_bytes())
    parsed = W.parse_warc(W.read_warc(spark, str(p))).collect()
    assert all(r["frame_suspect"] is False for r in parsed)


def test_frame_suspect_flags_marker_embedded_payload(spark, tmp_path):
    """A payload embedding the literal record marker mis-splits under
    marker framing (the documented trade) — the truncated first
    fragment must FLAG via the Content-Length cross-check instead of
    passing silently (ADVICE r11). The phantom fragment carries no
    Content-Length and stays unflagged; the flag on the real record is
    the detection signal."""
    quoted = "a crawled page quoting WARC/1.0\r\nWARC-Type: fake\r\n\r\ninner"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/quoting\r\n"
        f"Content-Length: {len(quoted)}\r\n"
        "\r\n" + quoted + "\r\n\r\n"
    )
    p = tmp_path / "embedded.warc"
    p.write_text(rec)
    parsed = W.parse_warc(W.read_warc(spark, str(p))).collect()
    assert len(parsed) == 2  # mis-split: real record + phantom fragment
    by_uri = {r["target_uri"]: r for r in parsed}
    real = by_uri["http://example.com/quoting"]
    assert real["frame_suspect"] is True  # payload truncated before the marker
    phantom = by_uri[""]
    assert phantom["frame_suspect"] is False  # no Content-Length to check
    assert phantom["warc_type"] == "fake"


def test_frame_suspect_keeps_content_owned_trailing_newlines(spark, tmp_path):
    """The exact-length check strips exactly ONE record separator, not
    every trailing newline — a payload that legitimately ends with a
    newline (WET text often does) must not flag."""
    body = "line one\nline two\n"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n" + body + "\r\n\r\n"
    )
    p = tmp_path / "trailnl.warc"
    p.write_text(rec)
    row = W.parse_warc(W.read_warc(spark, str(p))).first()
    assert row["frame_suspect"] is False


def _sink_df(spark):
    return spark.createDataFrame(
        [
            ("conversion", "http://a/1", "2026-01-01T00:00:00Z", "hello world"),
            ("conversion", "http://a/2", "2026-01-01T00:00:01Z", "line1\nline2"),
            ("warcinfo", "", "2026-01-01T00:00:02Z", "crawl=x"),
        ],
        "warc_type string, target_uri string, warc_date string, payload string",
    )


def test_write_warc_roundtrips_losslessly(spark, tmp_path):
    """r12 container sink: write → read → parse must return exactly the
    planted rows — multi-line payloads intact, Content-Length computed
    (frame_suspect false everywhere), absent URI omitted and parsed
    back as ''."""
    d = str(tmp_path / "w")
    W.write_warc(_sink_df(spark), d)
    rows = W.parse_warc(W.read_warc(spark, d)).orderBy("warc_date").collect()
    assert [(r["warc_type"], r["target_uri"], r["payload"]) for r in rows] == [
        ("conversion", "http://a/1", "hello world"),
        ("conversion", "http://a/2", "line1\nline2"),
        ("warcinfo", "", "crawl=x"),
    ]
    assert all(r["frame_suspect"] is False for r in rows)
    assert [r["content_length"] for r in rows] == [11, 11, 7]


def test_write_warc_every_part_file_is_a_valid_warc(spark, tmp_path):
    """Scale contract: the sink is distributed — one part file per
    task — and each part file must be a standalone spec-valid WARC
    file (records never span rows, rows never span files), so any
    conformant reader consumes the parts independently."""
    import glob

    d = str(tmp_path / "w")
    W.write_warc(_sink_df(spark).repartition(3), d)
    parts = [p for p in glob.glob(d + "/part*") if not p.endswith(".crc")]
    assert len(parts) >= 2  # genuinely multi-file
    total = 0
    for p in parts:
        content = open(p, "rb").read()
        if not content:
            continue
        assert content.startswith(b"WARC/1.0\r\n")
        assert content.endswith(b"\r\n\r\n")  # spec separator terminates
        n = W.parse_warc(W.read_warc(spark, p)).count()
        assert n >= 1
        total += n
    assert total == 3


def test_write_warc_refuses_marker_embedding_payload(spark, tmp_path):
    """The one input marker framing cannot survive must fail at WRITE
    time (per-row raise_error naming the URI), never produce a file
    that silently mis-frames later."""
    bad = spark.createDataFrame(
        [("conversion", "http://b/1", "2026-01-01T00:00:00Z",
          "quoting WARC/1.0\r\nWARC-Type: fake\r\n\r\ninner")],
        "warc_type string, target_uri string, warc_date string, payload string",
    )
    with pytest.raises(Exception, match="embeds the record marker"):
        W.write_warc(bad, str(tmp_path / "b"))


def test_write_warc_refuses_crlf_in_header_values(spark, tmp_path):
    """A CR/LF inside a header value would open a phantom header line
    (header smuggling) — refused at write time."""
    bad = spark.createDataFrame(
        [("conversion", "http://b/1\r\nWARC-Type: fake", "2026-01-01T00:00:00Z", "x")],
        "warc_type string, target_uri string, warc_date string, payload string",
    )
    with pytest.raises(Exception, match="CR/LF in a header value"):
        W.write_warc(bad, str(tmp_path / "b"))


def test_write_warc_refuses_newline_terminated_payload(spark, tmp_path):
    """r12 review: the third lossy class — a payload ending in a
    newline is indistinguishable from the record separator on
    read-back (the display trim would shorten it silently with
    frame_suspect still false) — must refuse at write time like the
    other two guards. Interior newlines stay fine."""
    bad = spark.createDataFrame(
        [("conversion", "http://b/1", "2026-01-01T00:00:00Z", "data\n")],
        "warc_type string, target_uri string, warc_date string, payload string",
    )
    with pytest.raises(Exception, match="ends with a newline"):
        W.write_warc(bad, str(tmp_path / "b1"))
    ok = spark.createDataFrame(
        [("conversion", "http://b/2", "2026-01-01T00:00:00Z", "in\nterior")],
        "warc_type string, target_uri string, warc_date string, payload string",
    )
    W.write_warc(ok, str(tmp_path / "b2"))
    row = W.parse_warc(W.read_warc(spark, str(tmp_path / "b2"))).first()
    assert row["payload"] == "in\nterior" and row["frame_suspect"] is False


def test_parse_warc_rejects_colliding_passthrough_names(spark):
    """r12 review: a passthrough column named like a parsed output
    column would silently duplicate the name and break downstream
    selects with AMBIGUOUS_REFERENCE — fail fast instead."""
    df = spark.createDataFrame(
        [("WARC-Type: x\r\n\r\nbody", "pre")], "record string, warc_date string"
    )
    with pytest.raises(ValueError, match="collide with the parsed"):
        W.parse_warc(df)


def test_write_warc_record_id_is_deterministic(spark, tmp_path):
    """WARC-Record-ID is an md5 urn over (uri, date, payload): two
    writes of the same rows must emit byte-identical ids (what makes
    written files oracle-replayable), and the id must parse back via
    the header projection + parse_warc passthrough."""
    from pyspark.sql import functions as F

    ids = []
    for sub in ["w1", "w2"]:
        d = str(tmp_path / sub)
        W.write_warc(_sink_df(spark), d)
        raw = W.read_warc(spark, d).withColumn(
            "record_id", W.warc_header(F.col("record"), "WARC-Record-ID")
        )
        parsed = W.parse_warc(raw).orderBy("warc_date")
        assert "record_id" in parsed.columns  # passthrough held
        ids.append([r["record_id"] for r in parsed.collect()])
    assert ids[0] == ids[1]
    assert all(i.startswith("<urn:md5:") and i.endswith(">") for i in ids[0])
    assert len(set(ids[0])) == 3  # distinct per record


def test_read_warc_stream_full_ladder(spark, tmp_path):
    """r12 streaming ingest: records arriving as files flow through
    the SAME projection ladder — two micro-batch drains (second file
    lands after the first drain) must together yield exactly the
    batch reader's parse, and the second drain must not reprocess the
    first file (file-source exactly-once)."""
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    out = []

    def drain():
        stream = W.read_warc_stream(spark, str(src))
        q = (
            W.parse_warc(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r["warc_type"], r["target_uri"], r["payload"], r["frame_suspect"])
                    for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "a.warc").write_text(
        "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://s/1\r\n"
        "Content-Length: 5\r\n\r\nfirst\r\n\r\n"
    )
    drain()
    assert out == [("conversion", "http://s/1", "first", False)]
    (src / "b.warc").write_text(
        "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://s/2\r\n"
        "Content-Length: 6\r\n\r\nsecond\r\n\r\n"
    )
    drain()
    assert sorted(out) == [
        ("conversion", "http://s/1", "first", False),
        ("conversion", "http://s/2", "second", False),
    ]


def test_write_read_roundtrip_property(spark, tmp_path):
    """Seeded adversarial roundtrip: 150 generated records — payloads
    mixing internal blank lines (\\r\\n\\r\\n INSIDE content), lone CRs,
    header-lookalike lines, HTTP-status-lookalike openings, unicode,
    empty payloads, and marker PREFIXES ('WARC/1.' without the full
    marker) — must come back byte-identical through write_warc →
    read_warc → parse_warc with frame_suspect false everywhere.
    Excluded by the documented trades: payload-trailing newlines
    (display-trimmed on read) and full embedded markers (refused at
    write). content_length must equal the payload's UTF-8 byte count
    on every row."""
    import random

    rng = random.Random(11)
    pieces = [
        "plain words", "line\nbreaks", "blank\r\n\r\ninside", "lone\rcr",
        "Fake-Header: value", "HTTP/1.1 lookalike", "WARC/1.", "tab\tsep",
        "unicode é ☃", "", "a" * 300,
    ]
    rows = []
    for i in range(150):
        body = " | ".join(
            rng.choice(pieces) for _ in range(rng.randrange(1, 4))
        ).rstrip("\r\n")
        # payloads OPENING with a real HTTP status line are consumed by
        # http_body downstream, but parse_warc must still return them
        # verbatim — keep them in.
        rows.append(
            ("conversion", f"http://p/{i}", "2026-01-01T00:00:00Z", body)
        )
    df = spark.createDataFrame(
        rows, "warc_type string, target_uri string, warc_date string, payload string"
    )
    d = str(tmp_path / "prop")
    W.write_warc(df, d)
    got = {
        r["target_uri"]: r
        for r in W.parse_warc(W.read_warc(spark, d)).collect()
    }
    assert len(got) == 150
    for wtype, uri, date, body in rows:
        r = got[uri]
        assert r["payload"] == body, (uri, body, r["payload"])
        assert r["frame_suspect"] is False, uri
        assert r["content_length"] == len(body.encode("utf-8")), uri
        assert r["warc_type"] == wtype and r["warc_date"] == date


def test_http_status_and_header_projections(spark):
    """r12 fetch-tier gate: status parses from HTTP/1.0, HTTP/1.1, and
    HTTP/2-style status lines; non-envelope payloads give NULL status
    and '' headers; header lookup is case-insensitive/first-wins and
    never leaks matches from the BODY (a body line that looks like a
    header must not count — the envelope ends at the blank line)."""
    rows = [
        (0, "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody"),
        (1, "HTTP/1.0 404 Not Found\r\ncontent-type: text/plain\r\n\r\nx"),
        (2, "HTTP/2 301\r\nLocation: /a\r\n\r\n"),
        (3, "plain wet text, no envelope"),
        (4, "HTTP/1.1 200 OK\r\nServer: s\r\n\r\nContent-Type: fake/body"),
        (5, "HTTP/1.1 200 OK\r\nContent-Type: a/1\r\nContent-Type: b/2\r\n\r\nx"),
    ]
    df = spark.createDataFrame(rows, "i long, payload string")
    got = {
        r["i"]: (r["st"], r["ct"])
        for r in df.select(
            "i",
            W.http_status(F.col("payload")).alias("st"),
            W.http_header(F.col("payload"), "Content-Type").alias("ct"),
        ).collect()
    }
    assert got[0] == (200, "text/html")
    assert got[1] == (404, "text/plain")  # case-insensitive name
    assert got[2] == (301, "")
    assert got[3] == (None, "")           # not an envelope
    assert got[4] == (200, "")            # body lookalike must NOT match
    assert got[5] == (200, "a/1")         # first occurrence wins


def test_header_names_are_literal(spark):
    """Header names are escaped into the regex: 'X.Custom' must not
    match 'XaCustom' via a wildcard dot (review finding)."""
    rec = "XaCustom: wrong\r\nX.Custom: right\r\n\r\nbody"
    df = spark.createDataFrame([(rec,)], "record string")
    from pyspark.sql import functions as F

    got = df.select(W.warc_header(F.col("record"), "X.Custom").alias("v")).first()["v"]
    assert got == "right"


def test_streaming_crawl_ladder_matches_batch(spark, tmp_path):
    """r13 streaming twin of the q189 composition: crawl segments
    ARRIVING AS FILES flow through the identical ladder projections
    (parse -> status/MIME gate -> HTML extract -> canonicalize ->
    robots with the prefix grammar) inside foreachBatch, with the
    keeper dedup resolving across micro-batches — the two crawled
    variants of each URL group land in DIFFERENT files/drains, so a
    per-batch-only dedup would keep both. The accumulated streaming
    corpus must equal the batch composition over the same bytes, and
    the second drain must not reprocess the first file."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import html as H
    from apache_hadoop_framework_for_peptide_identification_spark.operators import robots as R
    from apache_hadoop_framework_for_peptide_identification_spark.operators import urls as U

    crlf = "\r\n"

    def rec(doc_id, url, status_line, ctype, body):
        payload = f"{status_line}{crlf}Content-Type: {ctype}{crlf}{crlf}{body}"
        return (
            "WARC/1.0" + crlf + "WARC-Type: response" + crlf
            + f"WARC-Record-ID: <urn:doc:{doc_id}>" + crlf
            + f"WARC-Target-URI: {url}" + crlf
            + f"Content-Length: {len(payload.encode())}" + crlf + crlf
            + payload + crlf + crlf
        )

    def build(u, w):
        doc_id = 2 * u + w
        seg = "private" if u % 2 == 0 else "pub"
        if w == 0:
            url = f"https://docs.example.com/{seg}/u{u}?b=1&a=2"
        else:
            url = f"HTTPS://DOCS.EXAMPLE.COM:443/{seg}/u{u}?a=2&utm_x=1&b=1#f"
        s = u % 3
        if s == 0:
            return rec(doc_id, url, "HTTP/1.1 200 OK", "text/html",
                       f"<html><body><h1>D{doc_id}</h1><p>t{doc_id}</p></body></html>")
        if s == 1:
            return rec(doc_id, url, "HTTP/1.1 404 Not Found", "text/html", "gone")
        return rec(doc_id, url, "HTTP/1.1 200 OK", "image/jpeg", f"JPEG{doc_id}")

    src = tmp_path / "segments"
    src.mkdir()
    robots_df = spark.createDataFrame(
        [("Docs.example.com:443",
          "User-agent: examplebot\nDisallow: /private/\n\nUser-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rules = R.parse_robots(robots_df, user_agent="ExampleBot/1.2", ua_match="prefix")

    def ladder(parsed_df):
        rid = W.warc_header(F.col("record"), "WARC-Record-ID")
        parsed = W.parse_warc(
            parsed_df.select(
                F.regexp_extract(rid, r"urn:doc:(\d+)", 1).cast("long").alias("rec_id"),
                "record",
            )
        )
        pay = F.col("payload")
        status = W.http_status(pay)
        mime = F.trim(F.element_at(F.split(W.http_header(pay, "Content-Type"), ";"), 1))
        gated = parsed.filter((status == 200) & mime.startswith("text/")).select(
            "rec_id",
            ((F.col("rec_id") * 37) % 101).alias("qual"),
            H.extract_html_text(W.http_body(pay)).alias("clean_text"),
            U.canonicalize_url(F.col("target_uri")).alias("canon_url"),
        )
        return (
            R.robots_filter(gated, rules, url_col="canon_url")
            .filter(F.col("crawl_allowed"))
            .drop("crawl_allowed")
        )

    acc = []
    ckpt = str(tmp_path / "ck")

    def drain():
        stream = W.read_warc_stream(spark, str(src))
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: acc.extend(
                    (r["rec_id"], r["canon_url"], r["qual"], r["clean_text"])
                    for r in ladder(bdf).collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # variant 0 of every group arrives first; variant 1 a drain later
    (src / "seg-a.warc").write_text(
        "".join(build(u, 0) for u in range(12)), newline="")
    drain()
    n_first = len(acc)
    (src / "seg-b.warc").write_text(
        "".join(build(u, 1) for u in range(12)), newline="")
    drain()
    assert len(acc) == 2 * n_first  # exactly-once: file A not reprocessed

    # cross-batch keeper: best (qual desc, rec_id) per canonical URL
    best = {}
    for rec_id, canon, qual, text in acc:
        cur = best.get(canon)
        if cur is None or (qual, -rec_id) > (cur[2], -cur[0]):
            best[canon] = (rec_id, canon, qual, text)
    got = sorted(best.values())

    batch = ladder(W.read_warc(spark, str(src)))
    kept = U.url_keeper_dedup(batch, "canon_url", "rec_id", "qual")
    want = sorted(
        (r["rec_id"], r["canon_url"], r["qual"], r["clean_text"])
        for r in kept.collect()
    )
    assert got == want
    # sanity: only 200+text/html, robots-allowed groups survive (u=3,9)
    assert {r[1] for r in got} == {
        "https://docs.example.com/pub/u3?a=2&b=1",
        "https://docs.example.com/pub/u9?a=2&b=1",
    }
