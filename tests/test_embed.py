"""Text-embedding pipe tests: determinism across partitionings, schema
contract, and the semantic property that makes the hashed baseline a
real embedding — near-duplicate texts land close in cosine space,
unrelated texts don't."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_hadoop_framework_for_peptide_identification_spark.operators import similarity
from apache_hadoop_framework_for_peptide_identification_spark.operators.embed import embed_text


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),   # near-dup of 1
        (3, "completely different subject matter entirely xyzzy"),
        (4, "the quick brown fox jumps over the lazy dog"),    # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_schema_and_dim(texts):
    out = embed_text(texts, dim=32)
    assert dict(out.dtypes)["embedding"] == "array<float>"
    assert out.select(F.size("embedding")).distinct().collect()[0][0] == 32


def test_deterministic_across_partitionings(texts):
    a = {r["doc_id"]: r["embedding"] for r in embed_text(texts).collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_text(texts.repartition(3)).collect()}
    assert a == b


def test_neardup_semantics(texts):
    emb = embed_text(texts, dim=64)
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_neardup_pairs(emb, "doc_id", "embedding", 0.8)
        .collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] > 0.999   # exact dup -> cos ~1
    assert (1, 2) in pairs                              # near-dup above 0.8
    assert not any(3 in p for p in pairs)               # unrelated text excluded


def test_non_hash_method_raises(texts):
    with pytest.raises(NotImplementedError):
        embed_text(texts, method="bert")
