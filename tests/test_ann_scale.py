"""Opt-in ANN scale validation slice (set ANN_SCALE=1 to run).

A small (50k-vector) rerun of the SIFT1M-style recall harness in
`scripts/ann_scale_bench.py` — same seeded low-intrinsic-dim corpus
generator, same exact numpy ground truth, same recall thresholds the
reference enforces (recall >= 0.95,
`chromadb/test/property/invariants.py:281`; SIFT1M bar
`rust/benchmark/src/datasets/sift.rs:104-119`). The full 1M x 128-d grid is
recorded in BASELINE.md; this slice keeps the harness itself under test
without minutes of wall-clock per pytest run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("ANN_SCALE"), reason="set ANN_SCALE=1 for the scale slice"
)

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_scale")
N, DIM, NQ, K = 50_000, 128, 100, 100
N_LISTS = 256


@pytest.fixture(scope="module")
def scale_data(spark):
    from chroma_spark.ann.benchdata import gen_corpus, gen_queries, ground_truth
    from chroma_spark.ann.ivf import build_ivf

    corpus_dir = os.path.join(BASE, f"corpus_n{N}")
    queries_dir = os.path.join(BASE, f"queries_n{N}")
    gen_corpus(corpus_dir, N, DIM)
    gen_queries(queries_dir, NQ, DIM)
    gt = ground_truth(corpus_dir, queries_dir, K)
    records = spark.read.parquet(corpus_dir)
    queries = spark.read.parquet(os.path.join(queries_dir, "queries.parquet")).cache()
    centroids, postings = build_ivf(
        records, n_lists=N_LISTS, max_train_sample=32_768, restarts=2, max_iter=15,
        assign_method="arrow",
    )
    centroids, postings = centroids.cache(), postings.cache()
    postings.count()
    return records, queries, centroids, postings, gt


def _recall(rows, gt, k):
    from chroma_spark.ann.benchdata import recall_against_gt

    return recall_against_gt(rows, gt, k, set(range(NQ)))


def test_ivf_recall_at_scale(scale_data):
    from chroma_spark.ann.ivf import ivf_search

    _, queries, centroids, postings, gt = scale_data
    rows = ivf_search(centroids, postings, queries, k=K, nprobe=N_LISTS // 8).collect()
    assert _recall(rows, gt, 10) >= 0.95
    assert _recall(rows, gt, K) >= 0.95


def test_sq4_recall_at_scale(scale_data):
    from chroma_spark.ann.quantize import build_codes4, dim_ranges, ivf_sq4_search

    records, queries, centroids, postings, gt = scale_data
    ranges = dim_ranges(records)
    coded, _ = build_codes4(postings, ranges)
    rows = ivf_sq4_search(
        centroids, coded, queries, ranges, k=K, nprobe=N_LISTS // 8, rerank_factor=4
    ).collect()
    assert _recall(rows, gt, K) >= 0.95


def test_signbit_recall_at_scale(scale_data):
    from chroma_spark.ann.quantize import build_codes, dim_means, ivf_quantized_search

    records, queries, centroids, postings, gt = scale_data
    means = dim_means(records)
    coded, _ = build_codes(postings, means)
    rows = ivf_quantized_search(
        centroids, coded, queries, means, k=K, nprobe=N_LISTS // 4, rerank_factor=32
    ).collect()
    assert _recall(rows, gt, K) >= 0.95
