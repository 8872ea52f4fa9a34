#!/usr/bin/env python
"""Deterministic synthetic bench tables for the sf1 scaling tier.

The driver ships sf{0.001,0.01,0.1} (read-only); the round-6 verdict
asks for one more DECADE of scale on the slowest registry queries to
see which plan shapes drift superlinearly. This generator synthesizes
documents/embeddings tables with the same shape as the driver's
(5 langs in the same mix, 20 sources, ~54 tokens/doc over the same
31-word vocabulary, 10 labeled embedding clusters at dim 64) at two
sizes from ONE generator:

  benchdata/sf0.1twin/  5,000 docs /  2,000 vectors  (sf0.1-shaped)
  benchdata/sf1/       50,000 docs / 20,000 vectors  (10x)

Ratios are computed twin -> sf1 so the decade comparison is
generator-internal (no driver-vs-local generator mismatch noise).
Seeded (42); no external data. Only documents + embeddings are
generated — every one of the slow-tier queries reads just these two.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]   # sf0.1's observed mix
DIM = 64
N_LABELS = 10


def gen_documents(n: int, rng: np.random.RandomState):
    import pandas as pd

    lens = rng.randint(8, 101, size=n)           # ~54 tokens/doc mean
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    texts = []
    for i in range(n):
        toks = rng.randint(0, len(VOCAB), size=lens[i])
        texts.append(" ".join(VOCAB[t] for t in toks))
    # ~0.2% exact dups (matches the driver tables' trace amount):
    # copy an earlier doc's text onto a deterministic slice
    for i in range(500, n, 500):
        texts[i] = texts[i - 250]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(n: int, rng: np.random.RandomState):
    import pandas as pd

    centers = rng.randn(N_LABELS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, N_LABELS, size=n)
    vecs = centers[labels] * 0.8 + rng.randn(n, DIM) * 0.25
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
        "label": labels.astype(np.int64),
    })


def main() -> int:
    tiers = {"sf0.1twin": (5_000, 2_000), "sf1": (50_000, 20_000)}
    for name, (n_docs, n_vecs) in tiers.items():
        out = os.path.join(REPO, "benchdata", name)
        os.makedirs(out, exist_ok=True)
        rng = np.random.RandomState(42)    # same seed: sf1's first 5k
        # docs are NOT the twin's (lens differ by n) — two independent
        # same-family draws, which is what a real 10x corpus is
        gen_documents(n_docs, rng).to_parquet(
            os.path.join(out, "documents.parquet"), index=False)
        gen_embeddings(n_vecs, rng).to_parquet(
            os.path.join(out, "embeddings.parquet"), index=False)
        print(f"{name}: {n_docs} docs, {n_vecs} vectors -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
