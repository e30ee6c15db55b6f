"""As-of join edge cases (SURVEY.md §7 risk 4): inclusive vs exclusive
tie semantics, no-match nulls, per-key isolation."""

from __future__ import annotations

import pytest

from apache_hadoop_framework_for_peptide_identification_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "L1a"),   # before any right row for key 1
            (1, 10, "L1b"),  # exactly at right ts 10
            (1, 25, "L1c"),  # after right 10 and 20
            (2, 15, "L2a"),  # key 2 only has right at 12
            (3, 99, "L3a"),  # key 3 has no right rows at all
        ],
        "k long, lts long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, "R10"), (1, 20, "R20"), (2, 12, "R12"), (4, 1, "R_unused")],
        "k long, rts long, rval string",
    )
    return left, right


def _result(df):
    return {(r["k"], r["lts"]): r["rval"] for r in df.collect()}


def test_inclusive_matches_at_or_before(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    assert _result(out) == {
        (1, 5): None,     # nothing at or before 5
        (1, 10): "R10",   # tie -> matched (inclusive)
        (1, 25): "R20",   # latest at-or-before
        (2, 15): "R12",
        (3, 99): None,    # key never seen on the right
    }
    assert out.count() == left.count()  # left-join semantics: no row loss


def test_exclusive_skips_ties(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", inclusive=False
    )
    got = _result(out)
    assert got[(1, 10)] is None   # tie excluded under strict <
    assert got[(1, 25)] == "R20"  # strictly-before still matches


def test_right_key_without_left_rows_is_dropped(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    assert not [r for r in out.collect() if r["k"] == 4]


def test_matched_row_carried_atomically_nulls_preserved(spark):
    """The as-of MATCHED row's NULL payload fields must stay NULL — not
    be back-filled per-column from older right rows (ADVICE round 1:
    per-column last(ignorenulls) stitched different right rows together
    when payload columns are sparse; a native ASOF join returns the
    matched row whole)."""
    left = spark.createDataFrame([(1, 25, "L")], "k long, lts long, lval string")
    right = spark.createDataFrame(
        [(1, 10, "A10", None), (1, 20, None, "B20")],
        "k long, rts long, a string, b string",
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    row = out.collect()[0]
    # matched row is ts=20 -> (a=None, b='B20'); the old per-column fill
    # leaked a='A10' from the ts=10 row.
    assert row["a"] is None
    assert row["b"] == "B20"


def test_empty_right_payload_returns_left(spark):
    left = spark.createDataFrame([(1, 5, "x")], "k long, lts long, lval string")
    right = spark.createDataFrame([(1, 3)], "k long, rts long")
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    assert out.columns == left.columns
    assert out.count() == 1


def test_dotted_payload_column_name(spark):
    """Payload columns whose names contain dots must survive the final
    projection (ADVICE round 2: F.col("__rpay.{c}") parsed the name as
    a nested path; getField references the struct field literally)."""
    left = spark.createDataFrame([(1, 25)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 10, "v10"), (1, 20, "v20")], ["k", "rts", "px.y"]
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    assert out.columns == ["k", "lts", "px.y"]
    assert out.collect()[0]["px.y"] == "v20"


def test_dotted_on_key_column(spark):
    left = spark.createDataFrame([(1, 25)], ["k.g", "lts"])
    right = spark.createDataFrame([(1, 10, "v10"), (1, 20, "v20")], ["k.g", "rts", "p"])
    out = asof_join(left, right, on=["k.g"], left_ts="lts", right_ts="rts")
    assert out.columns == ["k.g", "lts", "p"]
    assert out.collect()[0]["p"] == "v20"
