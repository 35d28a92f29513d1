"""Seeded SPLADE-style sparse benchmark corpus for 1M-doc validation.

The reference benches sparse retrieval on Wikipedia-SPLADE + MS-MARCO
queries (`rust/benchmark/src/datasets/wikipedia_splade.rs`,
`ms_marco_queries.rs`): ~1M documents of learned-sparse vectors with
~100-300 active terms each over a BERT-wordpiece-sized vocabulary, and
much sparser queries. The sandbox has no network, so we synthesize a
corpus with the properties that matter for a term-bucket posting index:

- a heavy-tailed document-frequency distribution (``p(rank) ∝
  1/(rank+OFFSET)`` — a Zipf tail with the stopword head removed, the
  shape of SPLADE weights AFTER learned down-weighting has suppressed
  pure stopwords; an un-truncated Zipf head puts its top terms in every
  document, which benchmarks the degenerate all-candidates case instead
  of realistic posting lists),
- per-doc term counts lognormal around ~100 (docs) / ~25 (queries),
- positive gamma-distributed weights.

Determinism: chunked generation from ``np.random.default_rng([seed,
chunk])`` exactly like ``ann/benchdata.py`` — byte-identical across runs;
a params marker makes regeneration idempotent. The corpus is written
directly in POSTINGS form ``(id STRING, idx INT, doc_w DOUBLE)`` — the
shape both the inline exact scorer and ``write_sparse_index`` consume.
"""

from __future__ import annotations

import json
import os

VOCAB = 100_000
DF_OFFSET = 1000  # removes the stopword head: max df ~2-3% of docs
DOC_TERMS_MU, DOC_TERMS_SIGMA = 100.0, 0.35
QUERY_TERMS_MU, QUERY_TERMS_SIGMA = 25.0, 0.35
CHUNK = 20_000


def _chunk_rng(seed: int, chunk_idx: int):
    import numpy as np

    return np.random.default_rng([seed, chunk_idx])


def _term_cdf():
    import numpy as np

    w = 1.0 / (np.arange(VOCAB, dtype=np.float64) + DF_OFFSET)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def _marker_ok(path: str, params: dict) -> bool:
    marker = os.path.join(path, "_PARAMS.json")
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        return json.load(f) == params


def _write_marker(path: str, params: dict) -> None:
    with open(os.path.join(path, "_PARAMS.json"), "w") as f:
        json.dump(params, f)


def _draw_docs(rng, cdf, n_docs: int, mu: float, sigma: float, lo: int, hi: int):
    """(doc_idx, term, weight) arrays for n_docs documents, terms deduped
    per doc (vectorized: global sort on doc*VOCAB+term)."""
    import numpy as np

    n_terms = np.clip(
        np.round(np.exp(rng.normal(np.log(mu), sigma, size=n_docs))).astype(np.int64),
        lo,
        hi,
    )
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_terms)
    total = int(n_terms.sum())
    terms = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    key = np.unique(doc_idx * VOCAB + terms)
    doc_idx, terms = key // VOCAB, key % VOCAB
    weights = rng.gamma(2.0, 0.4, size=len(key)) + 0.1
    return doc_idx, terms.astype(np.int32), weights


def gen_sparse_postings(path: str, n_docs: int, seed: int = 11) -> None:
    """Write the corpus as posting chunks ``(id, idx, doc_w)``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    params = {"n_docs": n_docs, "seed": seed, "vocab": VOCAB, "off": DF_OFFSET,
              "mu": DOC_TERMS_MU, "sigma": DOC_TERMS_SIGMA}
    if _marker_ok(path, params):
        return
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    cdf = _term_cdf()
    schema = pa.schema(
        [pa.field("id", pa.string()), pa.field("idx", pa.int32()),
         pa.field("doc_w", pa.float64())]
    )
    for ci, start in enumerate(range(0, n_docs, CHUNK)):
        m = min(CHUNK, n_docs - start)
        doc_idx, terms, weights = _draw_docs(
            _chunk_rng(seed, ci), cdf, m, DOC_TERMS_MU, DOC_TERMS_SIGMA, 16, 400
        )
        ids = np.char.add("d", np.char.zfill((doc_idx + start).astype("U8"), 8))
        tbl = pa.Table.from_arrays(
            [pa.array(ids), pa.array(terms), pa.array(weights)], schema=schema
        )
        pq.write_table(tbl, os.path.join(path, f"part-{ci:05d}.parquet"))
    _write_marker(path, params)


def gen_sparse_queries(path: str, nq: int, seed: int = 11) -> None:
    """Queries as ``(query_id BIGINT, sparse STRUCT<indices, values>)`` —
    same term distribution, MS-MARCO-like sparsity, offset chunk index so
    draws never collide with the corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    params = {"nq": nq, "seed": seed, "vocab": VOCAB, "off": DF_OFFSET,
              "mu": QUERY_TERMS_MU, "sigma": QUERY_TERMS_SIGMA}
    if _marker_ok(path, params):
        return
    os.makedirs(path, exist_ok=True)
    cdf = _term_cdf()
    doc_idx, terms, weights = _draw_docs(
        _chunk_rng(seed, 1_000_003), cdf, nq, QUERY_TERMS_MU, QUERY_TERMS_SIGMA, 4, 120
    )
    indices, values = [], []
    for q in range(nq):
        sel = doc_idx == q
        order = np.argsort(terms[sel])
        indices.append(terms[sel][order].tolist())
        values.append(weights[sel][order].tolist())
    tbl = pa.Table.from_arrays(
        [
            pa.array(np.arange(nq, dtype=np.int64)),
            pa.StructArray.from_arrays(
                [
                    pa.array(indices, type=pa.list_(pa.int32())),
                    pa.array(values, type=pa.list_(pa.float64())),
                ],
                names=["indices", "values"],
            ),
        ],
        names=["query_id", "sparse"],
    )
    pq.write_table(tbl, os.path.join(path, "queries.parquet"))
    _write_marker(path, params)
