"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute force — broadcast the (small) query set,
  evaluate dot products with JVM higher-order functions, rank with a
  per-query window. At 100 TB this is one scan of the corpus and zero
  corpus shuffle: the only shuffled rows are (n_queries x corpus
  partitions x k) heap survivors.
- lsh_ann_topk: random-hyperplane LSH — signature via deterministic
  seeded planes (pandas UDF, Arrow-batched), band-bucket join to get
  candidates, exact re-rank inside buckets. Recall tunable by
  bands/bits; tested against the brute-force ground truth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(col):
    """||v||_2 as a JVM-side expression."""
    return F.sqrt(_dot(col, col))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, n_id, cos_sim, rn) with rn = 1..k per query,
    deterministic tie-break on neighbor id. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).cast("array<double>").alias("n_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (l2_norm(F.col("q_vec")) * l2_norm(F.col("n_vec")))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def _hyperplane_signature_udf(dim: int, bits: int, seed: int):
    """mapInPandas fn adding a packed LSH signature column: sign bits of
    dot(v, plane_j) for ``bits`` seeded random hyperplanes."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = np.random.RandomState(seed).standard_normal((dim, bits))
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(lsh_sig=pd.Series([], dtype="int64"))
                continue
            mat = np.vstack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
            signs = (mat @ planes) > 0  # (n, bits)
            weights = (1 << np.arange(bits, dtype=np.uint64))
            sig = (signs.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pdf.assign(lsh_sig=sig)

    return fn


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k cosine: hyperplane-LSH bucket join + exact
    re-rank of candidates. Corpus signatures are one Arrow-batched pass;
    the candidate join shuffles on (band, band_bits) only."""
    bits_per_band = bits // bands

    def with_sig(df: DataFrame) -> DataFrame:
        cols = df.select(F.col(id_col), F.col(vec_col).alias("embedding"))
        schema = f"{id_col} long, embedding array<float>, lsh_sig long"
        return cols.mapInPandas(_hyperplane_signature_udf(dim, bits, seed), schema)

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        # bands is a plain Python int, so unroll the band structs (shift
        # amounts must be literals for shiftrightunsigned).
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col("embedding").cast("array<double>").alias(f"{prefix}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            (
                                F.shiftrightunsigned(F.col("lsh_sig"), b * bits_per_band)
                                % (1 << bits_per_band)
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "bb.band", "bb.bucket")

    qb = banded(with_sig(queries), "q")
    cb = banded(with_sig(corpus), "n")
    cands = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .distinct()
    )
    scored = cands.select(
        "q_id",
        "n_id",
        (
            _dot(F.col("q_vec"), F.col("n_vec"))
            / (l2_norm(F.col("q_vec")) * l2_norm(F.col("n_vec")))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
