"""Multimodal column plumbing tests: binary payload schema, metadata
extraction, deterministic fake decode, frame sampling (1 row → N rows),
and the binaryFile source."""

from __future__ import annotations

import hashlib

import pytest

from apache_hadoop_framework_for_peptide_identification_spark.operators import multimodal
from apache_hadoop_framework_for_peptide_identification_spark.sources import readers


@pytest.fixture(scope="module")
def payload_df(spark):
    rows = [(i, f"document body {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return multimodal.attach_payload(df)


def test_payload_is_binary(payload_df):
    assert dict(payload_df.dtypes)["payload"] == "binary"


def test_extract_metadata_matches_hashlib(payload_df):
    out = {r["doc_id"]: r for r in multimodal.extract_metadata(payload_df).collect()}
    for i in range(10):
        body = f"document body {i}".encode()
        assert out[i]["n_bytes"] == len(body)
        assert out[i]["sha1"] == hashlib.sha1(body).hexdigest()
        assert out[i]["magic"] == body[:4].hex()


def test_decode_image_stub_raises_without_fake(payload_df):
    with pytest.raises(Exception, match="NotImplementedError|fake=True"):
        multimodal.decode_image(payload_df).collect()


def test_decode_image_fake_is_deterministic(payload_df):
    a = sorted(multimodal.decode_image(payload_df, fake=True).collect())
    b = sorted(multimodal.decode_image(payload_df.repartition(5), fake=True).collect())
    assert a == b
    for r in a:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert r["n_channels"] in (1, 3)


def test_frame_sample_fanout(payload_df):
    frames = multimodal.frame_sample(payload_df, n_frames=4)
    out = frames.collect()
    assert len(out) == 40
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], set()).add(r["frame_idx"])
    assert all(v == {0, 1, 2, 3} for v in per_doc.values())


def test_binary_file_source(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"blob_{i}.bin").write_bytes(bytes([i]) * (10 + i))
    df = readers.read_binary_files(spark, str(tmp_path), "*.bin")
    rows = {r["length"]: r for r in df.collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[11]["content"] == bytes([1]) * 11


def test_resize_stub_raises_without_fake(payload_df):
    import pytest as _pytest

    with _pytest.raises(Exception, match="Pillow|NotImplemented"):
        multimodal.resize_image(payload_df).collect()


def test_resize_fake_size_contract(payload_df):
    out = multimodal.resize_image(payload_df, width=32, height=32, fake=True).collect()
    assert all(len(r["payload"]) == 32 * 32 for r in out)
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
    # determinism: same payload -> same resized bytes
    again = multimodal.resize_image(payload_df, width=32, height=32, fake=True).collect()
    assert {(r["doc_id"], bytes(r["payload"])) for r in out} == {
        (r["doc_id"], bytes(r["payload"])) for r in again
    }


def test_extract_features_real_and_ann_compatible(payload_df, spark):
    """Features are real (byte-histogram projection), deterministic, and
    feed the similarity operators directly."""
    from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity

    # Plant two rows with IDENTICAL payloads so the positive case is
    # actually asserted (not just "cosines are in range").
    dup = payload_df.sparkSession.createDataFrame(
        [(100, "twin body"), (101, "twin body")], "doc_id long, text string"
    )
    with_twins = payload_df.select("doc_id", "text").unionByName(dup)
    feats = multimodal.extract_features(multimodal.attach_payload(with_twins), dim=16)
    rows = feats.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    again = {r["doc_id"]: r["features"] for r in feats.collect()}
    assert all(again[r["doc_id"]] == r["features"] for r in rows)
    # identical payloads -> identical features -> cosine 1 via the ANN op
    pairs = similarity.embedding_neardup_pairs(
        feats, id_col="doc_id", vec_col="features", threshold=0.999
    ).collect()
    assert all(-1.0001 <= r["cos_sim"] <= 1.0001 for r in pairs)
    assert (100, 101) in {(r["id_a"], r["id_b"]) for r in pairs}
