"""Text-embedding pipe (SURVEY.md §2B LLM table, last row): batch-embed
a text column into `array<float>` vectors.

The Spark-side contract is the real deliverable: Arrow-batched
`mapInPandas`, one model/process initialization per PARTITION (the
reference's amortize-startup insight, Driver.java:128), vectors emitted
as `array<float>` ready for the similarity/dedup operators. The model
itself is pluggable:

- `embed_text(..., method="hash")` — deterministic hashed
  bag-of-n-grams projection (feature hashing), a REAL baseline
  embedding (not a placeholder value): cosine similarity correlates
  with n-gram overlap, so downstream ANN/near-dup pipelines behave
  realistically. Pure numpy, no external deps.
- A real model swaps only `_hash_embed_batch` for an inference call
  (local model or service); batching/partitioning/schema stay as-is.
  For external embedding BINARIES, route through E-PIPE `run_chain`
  with the text staged per partition instead.

100 TB: zero shuffle (narrow map), model loaded once per partition,
batch size bounded by Arrow batch size. Embedding dim is a column
contract (`array<float>` of fixed length), enforced by tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _hash_count_batch(texts: pd.Series, dim: int, ngram: int, seed: int):
    """Signed feature-hashed character-n-gram COUNTS (int64) — the
    integer-valued accumulation under the hashed embedding. Exactly
    representable, so an external SQL engine can reproduce it
    bit-for-bit (q81's oracle unrolls the same FNV-1a chain)."""
    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.int64)
    for row, text in enumerate(texts):
        t = text or ""
        for i in range(max(len(t) - ngram + 1, 0)):
            # FNV-1a over the n-gram + seed: deterministic across
            # processes (Python's hash() is salted).
            h = np.uint64(14695981039346656037 + seed)
            for ch in t[i : i + ngram]:
                h = np.uint64((int(h) ^ ord(ch)) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
            idx = int(h % np.uint64(dim))
            out[row, idx] += 1 if (int(h) >> 63) == 0 else -1
    return out


def _hash_embed_batch(texts: pd.Series, dim: int, ngram: int, seed: int):
    """Feature-hashed character-n-gram embedding, L2-normalized."""
    import numpy as np

    out = _hash_count_batch(texts, dim, ngram, seed).astype(np.float32)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def embed_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    ngram: int = 3,
    seed: int = 42,
    method: str = "hash",
) -> DataFrame:
    """(id, embedding: array<float>) for every input row."""
    if method != "hash":
        raise NotImplementedError(
            "only the hashed-n-gram baseline ships in-container; plug a "
            "model by swapping _hash_embed_batch (see module docstring)"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-partition init happens HERE (model load / process fork in
        # a real impl) — once per partition, not per row.
        for pdf in batches:
            vecs = _hash_embed_batch(pdf[text_col], dim, ngram, seed)
            yield pd.DataFrame(
                {"id": pdf[id_col], "embedding": [v.tolist() for v in vecs]}
            )

    out_schema = "id long, embedding array<float>"
    return df.select(id_col, text_col).mapInPandas(fn, out_schema).withColumnRenamed(
        "id", id_col
    )


def embed_text_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    ngram: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, cvec: array<bigint>) — the pre-normalization integer counts
    of the hashed embedding, through the SAME Arrow-batched mapInPandas
    pipe as embed_text. This is the externally-verifiable form: the
    counts are exact integers, so the driver's DuckDB oracle can
    recompute them and hash-match (floats post-L2 can't be compared
    across engines bit-for-bit)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cnts = _hash_count_batch(pdf[text_col], dim, ngram, seed)
            yield pd.DataFrame({"id": pdf[id_col], "cvec": [c.tolist() for c in cnts]})

    out_schema = "id long, cvec array<bigint>"
    return df.select(id_col, text_col).mapInPandas(fn, out_schema).withColumnRenamed(
        "id", id_col
    )
