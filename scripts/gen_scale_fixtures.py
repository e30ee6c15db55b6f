#!/usr/bin/env python
"""Deterministic scale fixtures for the scaling-exponent sweeps
(r14 — VERDICT r13 item 2): documents + embeddings tables with the
SAME statistical shape as the driver's sf0.1 fixture (30-token uniform
vocabulary + one rare token, uniform 10-100 token lengths, ~0.16%
planted exact duplicates, iid-normal 64-dim float32 embeddings — the
profile measured from /root/testdata/sf0.1 in the r14 session), at
multipliers of the sf0.1 row counts (x1 = 5000 docs / 2000 vectors).

Heaps'-law variants (r15 — VERDICT r14 item 2): the fixed 30-token
vocabulary is faithful to the driver fixture but saturates the 4-gram
shingle space at x10 (96% occupancy — the measured cause of q121's
super-linear fixture exponent). The hx* tags grow the vocabulary with
the corpus (V = 30 · mult^0.5, Heaps' β = 0.5), which is the
df-bounded regime real web corpora live in and the regime the 100 TB
claim rests on: hx1 matches x1's shape, hx10 has ~95 tokens → 4-gram
occupancy a few %, so prefix postings stay df-bounded.

Self-generated at BOTH scopes deliberately: exponents compare like to
like, and the driver fixture dir is read-only. The non-scaled tables
(lineitem etc.) are symlinked from the base fixture dir
($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1) so the
stock-baseline tables() loader resolves. Output under .scaledata/
(gitignored — x10 is ~25 MB of parquet).

Usage: python scripts/gen_scale_fixtures.py [x03 x1 x3 x10 hx1 hx3 hx10 ...]
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DOCS = 5000
BASE_EMB = 2000
DIM = 64
SEED = 4242
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "key", "row", "group", "agg", "filter", "query", "scan",
    "batch", "sort", "hash", "join", "order", "line", "part", "data",
    "fast", "slow", "small", "big", "customer", "the", "a",
]
LANGS = ["en", "en", "de", "fr", "es", "zh"]  # en-heavy like the fixture

# tag -> (row multiplier, Heaps' beta for vocabulary growth; 0 = the
# driver fixture's fixed 30-token vocabulary)
SCALES = {
    "x03": (0.3, 0.0),
    "x1": (1.0, 0.0),
    "x3": (3.0, 0.0),
    "x10": (10.0, 0.0),
    "hx1": (1.0, 0.5),
    "hx3": (3.0, 0.5),
    "hx10": (10.0, 0.5),
}


def _vocab(mult: float, beta: float) -> list[str]:
    if beta == 0.0:
        return VOCAB
    # Heaps: V grows with corpus size; anchored so hx1 == x1's shape.
    v = max(len(VOCAB), int(math.ceil(len(VOCAB) * mult**beta)))
    return VOCAB + [f"tok{i}" for i in range(v - len(VOCAB))]


def gen_documents(n: int, rng: np.random.Generator, vocab_words: list[str]) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    texts = []
    vocab = np.array(vocab_words)
    for i in range(n):
        toks = vocab[rng.integers(0, len(vocab), size=lens[i])]
        if rng.random() < 0.01:  # the rare 'dup' marker token
            toks[rng.integers(0, lens[i])] = "dup"
        texts.append(" ".join(toks.tolist()))
    # ~0.16% planted exact duplicates (the sf0.1 rate: 4992/5000 unique)
    n_dup = max(1, int(n * 0.0016))
    for j in range(n_dup):
        src = int(rng.integers(0, n))
        dst = int(rng.integers(0, n))
        if src != dst:
            texts[dst] = texts[src]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n)],
                pa.string(),
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    mat = rng.standard_normal((n, DIM)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 10).astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_root = os.path.join(repo, ".scaledata")
    # Base fixture dir for the non-scaled symlinked tables — from the
    # environment like ann_recall_curves.py, never hardcoded (ADVICE
    # r14: a machine without /root/testdata/sf0.1 silently produced
    # dangling symlinks).
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(base_dir):
        sys.exit(
            f"gen_scale_fixtures: base fixture dir {base_dir!r} does not exist "
            "— set SPARK_GRAFT_SF_DIR to a driver-style parquet fixture dir"
        )
    want = sys.argv[1:] or list(SCALES)
    unknown = [t for t in want if t not in SCALES]
    if unknown:
        sys.exit(
            f"gen_scale_fixtures: unknown scale tag(s) {unknown} — "
            f"valid: {' '.join(SCALES)}"
        )
    for tag in want:
        mult, beta = SCALES[tag]
        d = os.path.join(out_root, tag)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(SEED)  # same stream prefix per scale:
        # x1 is a strict prefix-shape sibling of x10, not a disjoint corpus
        n_docs, n_emb = int(BASE_DOCS * mult), int(BASE_EMB * mult)
        vocab_words = _vocab(mult, beta)
        pq.write_table(
            gen_documents(n_docs, rng, vocab_words),
            os.path.join(d, "documents.parquet"),
        )
        pq.write_table(gen_embeddings(n_emb, rng), os.path.join(d, "embeddings.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events"):
            link = os.path.join(d, f"{t}.parquet")
            target = os.path.join(base_dir, f"{t}.parquet")
            # lexists, not exists: exists() follows the link, so a
            # DANGLING symlink from a previous run (the pre-r15
            # hardcoded-path scenario) reads as absent and os.symlink
            # then dies on the existing entry. Repair stale/dangling
            # links in place; leave real files alone.
            if os.path.islink(link):
                if os.readlink(link) != target:
                    os.remove(link)
                    os.symlink(target, link)
            elif not os.path.lexists(link):
                os.symlink(target, link)
        print(
            f"{tag}: {n_docs} docs, {n_emb} embeddings, vocab {len(vocab_words)} -> {d}"
        )


if __name__ == "__main__":
    main()
