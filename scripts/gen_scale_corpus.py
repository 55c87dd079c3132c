#!/usr/bin/env python
"""Generate the sf1-EQUIVALENT (10x sf0.1) documents/embeddings corpus
used by scripts/scale_sweep.py — the empirical backing for SCALING.md's
extrapolation claims.

Same statistical recipe as the driver testdata (probed from
/root/testdata/sf0.1, TESTDATA.md seed=42 corpus): 31-word uniform
vocabulary, 10-99 words per document, lang ~ (en .4, de/zh/fr/es .15),
source = src{doc_id % 20}, unit-normalized 64-dim embeddings with
labels 0-9 and no cluster structure. Deterministic (numpy seed 4242);
output is a one-off scratch artifact (default /tmp/scale10x) — never
written into /root/testdata, which is read-only by contract.

Usage: python scripts/gen_scale_corpus.py [out_dir] [docs_multiplier]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SF01_DOCS = 5_000
SF01_VECS = 2_000
DIM = 64


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_docs = SF01_DOCS * mult
    n_vecs = SF01_VECS * mult
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(4242)

    lengths = rng.randint(10, 100, size=n_docs)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.randint(0, len(VOCAB), size=n)])
        for n in lengths
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))

    vecs = rng.randn(n_vecs, DIM).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.randint(0, 10, size=n_vecs).tolist(), pa.int32()
            ),
        }
    )
    pq.write_table(etbl, os.path.join(out, "embeddings.parquet"))
    print(f"wrote {out}: {n_docs} documents, {n_vecs} embeddings")


if __name__ == "__main__":
    main()
