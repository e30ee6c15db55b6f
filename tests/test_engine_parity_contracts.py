"""Cross-engine parity contracts the r6 analytics oracles depend on
(round-6 VERDICT item 4).

q135/q142 hash-match only while Spark and DuckDB agree on day
truncation and day arithmetic; q143/q146 only while `median` /
`percentile` interpolate identically to DuckDB's `median` /
`quantile_cont`. Those agreements hold today, but a fixture
regeneration could move values onto the disagreement points (a
timestamp at an exact boundary, a percentile at a fractional rank) and
split the engines silently. These tests pin each contract on
ADVERSARIAL literal inputs — boundary timestamps, even/odd group
sizes, fractional ranks — the same way the watermark ms-floor rule is
pinned in test_streaming.py: if either engine ever changes semantics,
this fails BEFORE an oracle sweep turns a hash mismatch into an
archaeology project.

No fixture data involved: literal frames on both engines.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from pyspark.sql import functions as F

# Boundary instants for day truncation/arithmetic: exact midnight, the
# microseconds adjacent to it, year boundary, leap day, and a plain
# afternoon — the full set of places trunc semantics could diverge.
BOUNDARY_TS = [
    dt.datetime(2024, 3, 10, 0, 0, 0, 0),
    dt.datetime(2024, 3, 10, 0, 0, 0, 1),
    dt.datetime(2024, 3, 9, 23, 59, 59, 999999),
    dt.datetime(2023, 12, 31, 23, 59, 59, 999999),
    dt.datetime(2024, 1, 1, 0, 0, 0, 0),
    dt.datetime(2024, 2, 29, 12, 30, 45, 123456),
    dt.datetime(2024, 7, 4, 15, 0, 0, 500000),
]


def test_date_trunc_day_parity(spark):
    """Spark date_trunc('day') == DuckDB date_trunc('day') (q135/q142).

    DuckDB types day-truncation as DATE while Spark keeps TIMESTAMP;
    the oracle comparator canonicalizes both to datetime64, so the
    contract that protects the hashes is equality AFTER that pandas
    normalization (midnight instants), pinned here the same way."""
    import pandas as pd

    sp = (
        spark.createDataFrame([(t,) for t in BOUNDARY_TS], "ts timestamp")
        .select(F.date_trunc("day", "ts").alias("d"))
        .collect()
    )
    spark_days = [pd.Timestamp(r["d"]) for r in sp]
    duck_days = [
        pd.Timestamp(r[0])
        for r in duckdb.sql(
            "SELECT date_trunc('day', ts) FROM (SELECT unnest($ts) AS ts)",
            params={"ts": BOUNDARY_TS},
        ).fetchall()
    ]
    assert spark_days == duck_days, (
        "day-truncation parity broken: q135/q142's oracles assume "
        f"identical day keys; spark={spark_days} duck={duck_days}"
    )


def test_day_arithmetic_parity(spark):
    """Spark date_add(day_ts, n).cast(timestamp) == DuckDB d + to_days(n)
    — the q135 window-end construction. date_add narrows to DATE, so the
    cast back to TIMESTAMP must land on exact midnight for every offset."""
    days = [dt.datetime(2024, 2, 28), dt.datetime(2023, 12, 29), dt.datetime(2024, 3, 10)]
    offs = list(range(7))
    rows = [(d, o) for d in days for o in offs]
    sp = (
        spark.createDataFrame(rows, "d timestamp, off int")
        .select(F.date_add(F.col("d"), F.col("off")).cast("timestamp").alias("e"))
        .collect()
    )
    import pandas as pd

    spark_ends = sorted(pd.Timestamp(r["e"]) for r in sp)
    duck_ends = sorted(
        pd.Timestamp(r[0])
        for r in duckdb.sql(
            "SELECT d + to_days(off) FROM (SELECT unnest($d) AS d), "
            "(SELECT unnest($o) AS off)",
            params={"d": days, "o": offs},
        ).fetchall()
    )
    assert spark_ends == duck_ends, (
        "day-arithmetic parity broken (q135 win_end construction): "
        f"spark={spark_ends[:4]}... duck={duck_ends[:4]}..."
    )


@pytest.mark.parametrize(
    "values",
    [
        [1.0, 2.0, 3.0],  # odd n: exact middle element
        [1.0, 2.0, 3.0, 10.0],  # even n: midpoint interpolation
        [1.0, 1.0, 2.0, 2.0],  # ties across the midpoint
        [-5.0, 0.0, 0.0, 7.5, 100.0],  # odd with dup middle
        [3.25],  # singleton
    ],
)
def test_median_parity(spark, values):
    """Spark median == DuckDB median on even/odd/tied groups (q143's
    med and MAD passes both rest on this)."""
    sp = (
        spark.createDataFrame([(v,) for v in values], "v double")
        .agg(F.median("v").alias("m"))
        .first()["m"]
    )
    du = duckdb.sql(
        "SELECT median(v) FROM (SELECT unnest($v) AS v)", params={"v": values}
    ).fetchone()[0]
    assert sp == pytest.approx(du, abs=0.0, rel=0.0), (
        f"median interpolation parity broken for {values}: spark={sp} duck={du}"
    )


@pytest.mark.parametrize("q", [0.01, 0.25, 0.5, 0.75, 0.99])
def test_percentile_quantile_cont_parity(spark, q):
    """Spark percentile(x, q) == DuckDB quantile_cont(x, q) at
    fractional ranks (q146's p01/p99 clamp bounds; q31's contract).
    n=7 makes every tested q land between elements, forcing the linear
    interpolation path on both engines."""
    values = [0.5, 1.5, 2.25, 4.0, 8.0, 16.0, 100.0]
    sp = (
        spark.createDataFrame([(v,) for v in values], "v double")
        .agg(F.expr(f"percentile(v, {q})").alias("p"))
        .first()["p"]
    )
    du = duckdb.sql(
        f"SELECT quantile_cont(v, {q}) FROM (SELECT unnest($v) AS v)",
        params={"v": values},
    ).fetchone()[0]
    assert sp == pytest.approx(du, abs=0.0, rel=0.0), (
        f"percentile interpolation parity broken at q={q}: spark={sp} duck={du}"
    )


def test_md5_prefix_bucket_parity(spark):
    """Spark conv(substr(md5(s),1,15),16,10) % 4096 == DuckDB
    ('0x'||substr(md5(s),1,15))::UBIGINT % 4096 (q163's feature-hash
    buckets; the same portable-md5 technique backs q120/q140).
    Adversarial inputs: strings whose md5 prefix starts with '0'
    (leading-zero hex), with 'f' (high bit set — conv must stay
    unsigned within 60 bits), the empty string, and a non-ASCII
    string (both engines must hash UTF-8 bytes)."""
    strs = ["", "a", "the quick", "zz01 zz02", "naïve café", "0", "ffff", "x" * 100]
    sp = {
        r["s"]: r["b"]
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select(
            "s",
            F.pmod(
                F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long"),
                F.lit(4096),
            ).alias("b"),
        )
        .collect()
    }
    du = {
        r[0]: r[1]
        for r in duckdb.sql(
            "SELECT s, ('0x' || substr(md5(s), 1, 15))::UBIGINT % 4096 "
            "FROM (SELECT unnest($s) AS s)",
            params={"s": strs},
        ).fetchall()
    }
    assert sp == du, f"md5-prefix bucket parity broken: spark={sp} duck={du}"


def test_md5_hex_pair_byte_parity(spark):
    """Byte i of an md5 DIGEST == int(hex_pair[2i:2i+2], 16) of the md5
    HEX STRING, and Spark's md5() == DuckDB's md5() on UTF-8 input —
    the q69 decode-stub contract (width/height/channels derive from
    digest bytes 0..2 in Python hashlib; the oracle re-derives them
    from hex pairs of DuckDB's md5(text))."""
    import hashlib

    strs = ["", "doc body 1", "naïve café ☕", "tab\tand newline\n"]
    for s in strs:
        digest = hashlib.md5(s.encode("utf-8")).digest()
        hexstr = hashlib.md5(s.encode("utf-8")).hexdigest()
        du_hex = duckdb.sql("SELECT md5($s)", params={"s": s}).fetchone()[0]
        assert du_hex == hexstr, f"DuckDB md5 differs from hashlib for {s!r}"
        for i in range(3):
            assert digest[i] == int(hexstr[2 * i : 2 * i + 2], 16)
    sp_hex = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.md5("s").alias("h"))
        .collect()
    }
    for s in strs:
        assert sp_hex[s] == hashlib.md5(s.encode("utf-8")).hexdigest(), (
            f"Spark md5 differs from hashlib for {s!r}"
        )


def test_tumbling_chunk_slicing_parity(spark):
    """Spark concat_ws(' ', slice(toks, i*8+1, 8)) over
    sequence(0, floor(n/8)-1) == DuckDB
    array_to_string(t[i*8+1 : i*8+8], ' ') over range(0, n//8) —
    q164's chunker. Adversarial token counts: n < 8 (no chunks),
    n = 8 (one), n = 15 (tail dropped), n = 16 (two exact), n = 17.
    A disagreement on 1-based slice bounds or tail handling would
    silently split the engines after a fixture regeneration."""
    texts = [
        " ".join(f"t{j}" for j in range(n)) for n in (1, 7, 8, 15, 16, 17, 24)
    ]
    toks = F.split(F.col("s"), " ")
    n_chunks = F.floor(F.size(toks) / 8).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 8 + 1, 8)),
    )
    sp = sorted(
        (r["s"], r["pos"], r["chunk"])
        for r in spark.createDataFrame([(t,) for t in texts], "s string")
        .filter(n_chunks >= 1)
        .select("s", F.posexplode(chunk_arr).alias("pos", "chunk"))
        .collect()
    )
    du = sorted(
        duckdb.sql(
            """
            SELECT s, CAST(i AS INT) AS pos,
                   array_to_string(t[i*8+1 : i*8+8], ' ') AS chunk
            FROM (SELECT s, string_split(s, ' ') AS t
                  FROM (SELECT unnest($s) AS s)),
                 unnest(range(0, len(t) // 8)) AS u(i)
            """,
            params={"s": texts},
        ).fetchall()
    )
    assert sp == du, f"chunk slicing parity broken: spark={sp[:3]} duck={du[:3]}"
