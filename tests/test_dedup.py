"""Dedup scale-path tests: the banded/bucketed candidate generators that
replace all-pairs joins at 100 TB (VERDICT r1 "registered-query
anti-patterns") — exactness of simhash banding, planted-dup recall of the
LSH/IVF embedding near-dup, and no-CartesianProduct plan pins.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from chroma_spark.operators import dedup as D

from .conftest import SF_SMALL


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("id"), F.col("text").alias("document"))
    )


def test_simhash_banded_equals_all_pairs(spark):
    """bands > max_hamming makes banding EXACT (pigeonhole): the banded
    join must reproduce the all-pairs result verbatim."""
    docs = _docs(spark, SF_SMALL)
    allp = {(r.id_a, r.id_b, r.hamming) for r in D.simhash_pairs(docs, max_hamming=3).collect()}
    band = {(r.id_a, r.id_b, r.hamming) for r in D.simhash_pairs_banded(docs, max_hamming=3).collect()}
    assert band == allp and len(allp) > 0


def test_simhash_banded_rejects_insufficient_bands(spark):
    docs = _docs(spark, SF_SMALL)
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs_banded(docs, max_hamming=4, bands=3)


def _planted_embeddings(spark, n_base=120, n_dup=30, dim=32, seed=7):
    """Random unit-ish vectors + planted near-duplicates (tiny angular
    perturbations). Returns (records_df, planted_pair_set)."""
    rnd = random.Random(seed)

    def vec():
        return [rnd.gauss(0, 1) for _ in range(dim)]

    rows, planted = [], set()
    for i in range(n_base):
        rows.append((i, vec()))
    for j in range(n_dup):
        src = rnd.randrange(n_base)
        base = rows[src][1]
        dup = [x + rnd.gauss(0, 0.02) for x in base]  # ~1-2 degree wobble
        did = n_base + j
        rows.append((did, dup))
        planted.add((min(src, did), max(src, did)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "id BIGINT, embedding ARRAY<FLOAT>"
    )
    return df, planted


def test_embedding_neardup_banded_recall_on_planted_dups(spark):
    records, planted = _planted_embeddings(spark)
    found = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(records, threshold=0.05, dim=32).collect()
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"banded LSH recall {recall} on planted near-dups"
    # precision: everything returned really is within threshold (exact verify)
    assert all(
        r.dist <= 0.05
        for r in D.embedding_neardup_banded(records, threshold=0.05, dim=32).collect()
    )


def test_embedding_neardup_ivf_recall_on_planted_dups(spark):
    from chroma_spark.ann.ivf import build_ivf

    records, planted = _planted_embeddings(spark)
    _, postings = build_ivf(records, n_lists=8, replicas=2)
    found = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_ivf(postings, threshold=0.05).collect()
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"IVF-bucketed recall {recall} on planted near-dups"


def test_jaccard_prefix_candidates_exact(spark):
    """Prefix filtering must reproduce the quadratic self-join result
    verbatim (recall 1.0 for Jaccard >= t by the AllPairs bound)."""
    docs = _docs(spark, SF_SMALL)
    quad = {(r.id_a, r.id_b, r.jac) for r in D.jaccard_pairs(docs, 0.5).collect()}
    cand = D.jaccard_prefix_candidates(docs, 0.5)
    pref = {
        (r.id_a, r.id_b, r.jac)
        for r in D.jaccard_pairs(docs, 0.5, candidates=cand).collect()
    }
    assert pref == quad and len(quad) > 0


def test_banded_dedup_plans_have_no_cartesian_product(spark):
    from chroma_spark.registry import QUERIES

    for name in (
        "dedup_simhash",
        "neardup_embedding",
        "dedup_minhash_lsh",
        "dedup_jaccard",
        "dedup_minhash_incr",
    ):
        plan = QUERIES[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_connected_components_chains_stars_and_isolation(spark):
    """Min-label propagation: a 4-chain, a star, and an isolated pair each
    collapse to their min id; ids never in pairs don't appear."""
    from chroma_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (3, 7), (7, 9), (9, 12),          # chain: {3,7,9,12} -> 3
            (20, 21), (20, 22), (20, 23),     # star: -> 20
            (40, 41),                          # pair -> 40
        ],
        "id_a LONG, id_b LONG",
    )
    got = {r.id: r.canonical for r in connected_components(pairs).collect()}
    assert got == {
        3: 3, 7: 3, 9: 3, 12: 3,
        20: 20, 21: 20, 22: 20, 23: 20,
        40: 40, 41: 40,
    }
    # dedup decision: keep canonical rows only
    keep = {i for i, c in got.items() if i == c}
    assert keep == {3, 20, 40}


def test_connected_components_long_chain_converges_logarithmically(spark):
    """Pointer jumping doubles propagation distance per round: a 33-node
    chain (diameter 32) must converge well under 32 rounds — and the
    max_iter-exhausted path warns instead of silently splitting."""
    import warnings

    from chroma_spark.operators.dedup import connected_components

    n = 33
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    got = {r.id: r.canonical for r in connected_components(pairs, max_iter=8).collect()}
    assert got == {i: 0 for i in range(n)}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(pairs, max_iter=1).collect()
    assert any("max_iter" in str(x.message) for x in w)


def test_minhash_incremental_matches_filtered_full_batch(spark, tmp_path):
    """Incremental = full-corpus pairs touching the batch; persisted band
    table round-trips; corpus text is hydrated only for candidates."""
    from chroma_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_incremental_pairs,
        write_minhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    corpus_rows = [
        ("c1", base + "one two three four five"),
        ("c2", base + "one two three four six"),   # near-dup of c1
        ("c3", "completely different text about spark shuffles and joins ok"),
    ]
    new_rows = [
        ("n1", base + "one two three four five"),  # dup of c1/c2
        ("n2", base + "one two three four seven"), # near-dup of the family
        ("n3", "unrelated fresh content with nothing shared at all here"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "id STRING, document STRING")
    new = spark.createDataFrame(new_rows, "id STRING, document STRING")

    path = str(tmp_path / "mh_index")
    params = write_minhash_index(corpus, path)
    bands_df = spark.read.parquet(path)

    got = {
        (r.id_a, r.id_b): r.jac
        for r in minhash_incremental_pairs(
            new, corpus, bands_df, 0.5, **{k: params[k] for k in ("num_perm", "bands", "n")}
        ).collect()
    }
    # ground truth: full batch over corpus+new, pairs touching a new id
    full = minhash_dedup_pairs(corpus.unionByName(new), 0.5)
    new_ids = {"n1", "n2", "n3"}
    want = {
        (r.id_a, r.id_b): r.jac
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }
    assert got == want and ("c1", "n1") in got  # cross pair found
    assert not any(a not in new_ids and b not in new_ids for a, b in got)


def test_semdedup_decisions_on_planted_dups(spark):
    """SemDeDup end to end from a built IVF layout: one decision row per
    record, exactly one keeper per duplicate group (the member furthest
    from its centroid, ties to the smaller id), singletons all kept, and
    planted near-dup pairs land in a shared group."""
    from chroma_spark.ann.ivf import build_ivf

    records, planted = _planted_embeddings(spark)
    cents, postings = build_ivf(records, n_lists=8, replicas=2)
    rows = D.semdedup_from_postings(postings, cents, threshold=0.05).collect()

    n_records = records.count()
    assert len(rows) == n_records
    assert len({r.id for r in rows}) == n_records

    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r.group, []).append(r)
    for g, members in by_group.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1, f"group {g}: {len(keepers)} keepers"
        best = max(members, key=lambda m: (m.cd, -m.id))
        assert keepers[0].id == best.id, f"group {g}: keeper not furthest-from-centroid"
        if len(members) == 1:
            assert members[0].keep and members[0].group == members[0].id

    group_of = {r.id: r.group for r in rows}
    same = sum(1 for a, b in planted if group_of[a] == group_of[b])
    assert same / len(planted) >= 0.9, f"planted-pair grouping recall {same / len(planted)}"


def test_semdedup_registry_plan_has_no_cartesian_product(spark):
    from chroma_spark.registry import QUERIES

    plan = QUERIES["semdedup"].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    # the fixed-centroid assignment broadcasts 8 centroids by design; the
    # within-cluster pair join must stay a keyed equi-join
    assert "CartesianProduct" not in plan


def test_semdedup_arrow_tier_matches_expr(spark):
    """The GEMM pair tier must produce the identical decision frame as the
    Catalyst-expression oracle path on the same assignment (same clusters,
    same rounding discipline)."""
    from chroma_spark.ann.ivf import build_ivf

    records, _ = _planted_embeddings(spark)
    cents, postings = build_ivf(records, n_lists=8, replicas=2)
    expr = {
        (r.id, r.group, r.cd, r.keep)
        for r in D.semdedup_from_postings(postings, cents, threshold=0.05).collect()
    }
    arrow = {
        (r.id, r.group, r.cd, r.keep)
        for r in D.semdedup_from_postings(
            postings, cents, threshold=0.05, method="arrow"
        ).collect()
    }
    assert arrow == expr and len(expr) == records.count()
