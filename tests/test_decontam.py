"""Decontamination (n-gram overlap vs an eval set) and regex redaction —
training-data hygiene operators (operators/decontam.py, textstats.redact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chroma_spark.operators.decontam import ngram_contamination
from chroma_spark.operators.textstats import redact
from chroma_spark.where import WhereError


def _df(spark, rows):
    return spark.createDataFrame(rows, "id STRING, document STRING")


def test_ngram_contamination_flags_shared_ngrams(spark):
    train = _df(
        spark,
        [
            ("t1", "the quick brown fox jumps over the lazy dog"),
            ("t2", "entirely novel content with no overlap at all"),
            ("t3", "prefix words then the quick brown fox appears twice the quick brown fox"),
            ("t4", None),
        ],
    )
    eval_set = _df(spark, [("e1", "she saw the quick brown fox leap")])
    got = {r.id: r.n_hits for r in ngram_contamination(train, eval_set, n=4).collect()}
    # "the quick brown fox" is the only shared 4-gram; t3 contains it twice
    # but n_hits counts DISTINCT contaminated n-grams
    assert got == {"t1": 1, "t3": 1}


def test_ngram_contamination_plan_broadcasts_eval_side(spark):
    train = _df(spark, [(f"t{i}", f"doc number {i} body text here") for i in range(50)])
    eval_set = _df(spark, [("e1", "doc number 7 body text here")])
    plan = (
        ngram_contamination(train, eval_set, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan, "eval n-gram set must broadcast (train never shuffles to join)"
    assert "SortMergeJoin" not in plan


def test_redact_counts_and_replaces_all(spark):
    docs = _df(
        spark,
        [
            ("a", "email me or email the team"),
            ("b", "nothing to hide"),
            ("c", None),
        ],
    )
    rows = {r.id: r for r in redact(docs, r"\bemail\b", "[MAIL]").collect()}
    assert rows["a"].n_redacted == 2
    assert rows["a"].redacted == "[MAIL] me or [MAIL] the team"
    assert rows["b"].n_redacted == 0 and rows["b"].redacted == "nothing to hide"
    assert rows["c"].n_redacted == 0 and rows["c"].redacted == ""


def test_redact_rejects_dialect_violations_and_group_refs(spark):
    docs = _df(spark, [("a", "x")])
    with pytest.raises(WhereError):
        redact(docs, "(?=lookahead)", "x")
    with pytest.raises(WhereError, match="literal"):
        redact(docs, "abc", "$1")
    with pytest.raises(WhereError, match="literal"):
        redact(docs, "abc", r"\1")


def test_redact_stays_jvm_side(spark):
    docs = _df(spark, [("a", "some text")])
    plan = redact(docs, "text", "X")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hash_sample_deterministic_and_stratified(spark):
    from chroma_spark.operators.sampling import hash_sample

    rows = [(f"d{i}", "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id STRING, source STRING")
    s1 = {r.id for r in hash_sample(df, rates_by_group={"a": 0.5}, default_rate=0.1).collect()}
    s2 = {r.id for r in hash_sample(df, rates_by_group={"a": 0.5}, default_rate=0.1).collect()}
    assert s1 == s2, "hash sampling must be run-deterministic"
    a = sum(1 for i in s1 if int(i[1:]) % 2)
    b = len(s1) - a
    assert 0.40 * 1000 < a < 0.60 * 1000, a  # ~50% of group a
    assert 0.05 * 1000 < b < 0.16 * 1000, b  # ~10% of group b
    # membership is per-row stable: sampling a subset agrees with the full run
    sub = df.limit(500)
    s_sub = {r.id for r in hash_sample(sub, rates_by_group={"a": 0.5}, default_rate=0.1).collect()}
    sub_ids = {r.id for r in sub.collect()}
    assert s_sub == s1 & sub_ids
    # different salts draw independent subsets (not identical)
    s3 = {r.id for r in hash_sample(df, rate=0.5, salt="other").collect()}
    s4 = {r.id for r in hash_sample(df, rate=0.5).collect()}
    assert s3 != s4
    with pytest.raises(ValueError):
        hash_sample(df)
    with pytest.raises(ValueError):
        hash_sample(df, rate=0.1, rates_by_group={"a": 0.2})


def test_hash_sample_stays_jvm_side(spark):
    from chroma_spark.operators.sampling import hash_sample

    df = spark.createDataFrame([("x", "s")], "id STRING, source STRING")
    plan = hash_sample(df, rate=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan, "sampling is one scan, no shuffle"


def test_chunk_documents_windows_and_overlap(spark):
    from chroma_spark.operators.textstats import chunk_documents

    docs = _df(
        spark,
        [
            ("a", "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            ("b", "only three tokens"),
            ("c", ""),
            ("d", None),
        ],
    )
    rows = sorted(
        (r.id, r.chunk_idx, r.chunk, r.n_tokens)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    # stride 3: starts 0,3,6 — the window at 6 reaches the end, so no
    # redundant overlap-only tail chunk is emitted
    assert rows == [
        ("a", 0, "t0 t1 t2 t3", 4),
        ("a", 1, "t3 t4 t5 t6", 4),
        ("a", 2, "t6 t7 t8 t9", 4),
        ("b", 0, "only three tokens", 3),
    ]
    # no-overlap path and exact coverage: concatenation reconstructs the doc
    plain = chunk_documents(docs.filter("id = 'a'"), chunk_tokens=3, overlap=0)
    joined = " ".join(r.chunk for r in plain.orderBy("chunk_idx").collect())
    assert joined == "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)


def test_chunk_documents_matches_python_model(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from chroma_spark.operators.textstats import chunk_documents

    def model(toks, chunk, overlap):
        if not toks:
            return []
        stride = chunk - overlap
        n_chunks = (max(len(toks) - overlap, 1) - 1) // stride + 1
        return [
            (i, " ".join(toks[i * stride : i * stride + chunk]), len(toks[i * stride : i * stride + chunk]))
            for i in range(n_chunks)
        ]

    @settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        n_toks=st.integers(min_value=0, max_value=25),
        chunk=st.integers(min_value=1, max_value=8),
        overlap=st.integers(min_value=0, max_value=7),
    )
    def check(n_toks, chunk, overlap):
        if overlap >= chunk:
            return
        toks = [f"w{i}" for i in range(n_toks)]
        df = spark.createDataFrame([("d", " ".join(toks))], "id STRING, document STRING")
        got = sorted(
            (r.chunk_idx, r.chunk, r.n_tokens)
            for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
        )
        assert got == model(toks, chunk, overlap), (n_toks, chunk, overlap)

    check()


def test_contamination_filter_composes(spark):
    """The intended pipeline: anti-join contaminated ids out of the corpus."""
    train = _df(
        spark,
        [("t1", "alpha beta gamma delta"), ("t2", "safe words only here")],
    )
    eval_set = _df(spark, [("e1", "alpha beta gamma delta epsilon")])
    contaminated = ngram_contamination(train, eval_set, n=4)
    clean = train.join(contaminated, "id", "anti")
    assert [r.id for r in clean.collect()] == ["t2"]


def test_repetition_stats_known_values(spark):
    """Handcrafted docs with known duplicate structure pin the semantics."""
    from chroma_spark.operators.textstats import repetition_stats

    doc = "aa bb\naa bb\ncc dd ee"  # line 'aa bb' twice (5 chars), 'cc dd ee' once (8)
    df = spark.createDataFrame(
        [("d1", doc), ("d2", "one two three four five six"), ("d3", ""), ("d4", None)],
        "id STRING, document STRING",
    )
    rows = {r.id: r for r in repetition_stats(df, dup_n=2).collect()}
    r1 = rows["d1"]
    assert r1.dup_line_frac == round(2 / 3, 6)
    assert r1.dup_line_char_frac == round(10 / 18, 6)
    # 2-grams of [aa bb aa bb cc dd ee]: 'aa bb' x2, 'bb aa', 'bb cc', 'cc dd', 'dd ee'
    # top gram 'aa bb': 2*5 chars of total 2*5+5+5+5+5 = 30
    assert r1.top_ngram_char_frac == round(10 / 30, 6)
    assert r1.dup_ngram_char_frac == round(10 / 30, 6)
    r2 = rows["d2"]  # no repetition at all
    assert r2.dup_line_frac == 0.0 and r2.dup_ngram_char_frac == 0.0
    assert r2.top_ngram_char_frac > 0  # some gram is the top one
    # empty / null docs report zeros, not nulls or missing rows
    for d in ("d3", "d4"):
        r = rows[d]
        assert (r.dup_line_frac, r.top_ngram_char_frac, r.dup_ngram_char_frac) == (0.0, 0.0, 0.0)


def test_gopher_quality_gate(spark):
    from chroma_spark.operators.textstats import gopher_quality

    good = "the quick brown fox jumps over it and the dog is in a field of grass " * 5
    bullets = "\n".join("- item " + str(i) for i in range(20))
    symbols = "#tag " * 80
    df = spark.createDataFrame(
        [("good", good), ("bullets", bullets), ("symbols", symbols), ("short", "too short")],
        "id STRING, document STRING",
    )
    rows = {r.id: r for r in gopher_quality(df, min_words=20).collect()}
    assert rows["good"].passes
    assert not rows["bullets"].passes and rows["bullets"].bullet_frac == 1.0
    assert not rows["symbols"].passes and rows["symbols"].symbol_ratio >= 0.1
    assert not rows["short"].passes and rows["short"].n_words == 2


def test_ngram_topk_counts_and_order(spark):
    from chroma_spark.operators.textstats import ngram_topk

    df = spark.createDataFrame(
        [
            ("d1", "a b c a b c x"),
            ("d2", "a b c z z z"),
            ("d3", "q r s"),
        ],
        "id STRING, document STRING",
    )
    rows = ngram_topk(df, n=3, k=3).collect()
    # 'a b c' occurs 3 times (twice in d1, once in d2) across 2 docs
    assert (rows[0].ngram, rows[0].cnt, rows[0].doc_freq) == ("a b c", 3, 2)
    # remaining single-occurrence grams break ties lexicographically
    assert [r.ngram for r in rows[1:]] == sorted(r.ngram for r in rows[1:])
    assert all(r.cnt == 1 for r in rows[1:])


def test_mix_to_proportions_targets_and_binding_group(spark):
    from chroma_spark.operators.sampling import mix_to_proportions

    rows = (
        [(f"a{i}", "A") for i in range(400)]
        + [(f"b{i}", "B") for i in range(100)]
        + [(f"c{i}", "C") for i in range(300)]
    )
    df = spark.createDataFrame(rows, "id STRING, source STRING")
    # B is binding: T = min(400/.5, 100/.25, 300/.25) = 400
    out = mix_to_proportions(df, {"A": 0.5, "B": 0.25, "C": 0.25}, salt="s")
    by_src = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert by_src["B"] == 100  # binding group kept whole (rate exactly 1)
    # others land near their targets (md5-uniform; generous tolerance)
    assert abs(by_src["A"] - 200) <= 40
    assert abs(by_src["C"] - 100) <= 30
    # determinism: exact same subset on re-run
    again = {r.id for r in mix_to_proportions(df, {"A": 0.5, "B": 0.25, "C": 0.25}, salt="s").collect()}
    assert again == {r.id for r in out.collect()}


def test_mix_to_proportions_drops_unlisted_and_handles_missing(spark):
    from chroma_spark.operators.sampling import mix_to_proportions

    df = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("z1", "Z")], "id STRING, source STRING"
    )
    out = mix_to_proportions(df, {"A": 1.0}, salt="s").collect()
    assert {r.source for r in out} == {"A"}  # Z dropped
    # a listed-but-absent source doesn't zero everything out: it simply has
    # no rows (matches the SQL twin, whose counts CTE has no row for it)
    out2 = mix_to_proportions(df, {"A": 0.5, "GONE": 0.5}, salt="s")
    assert {r.source for r in out2.collect()} <= {"A"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mix_to_proportions(df, {})


def test_curate_pipeline_stages(spark):
    from chroma_spark.operators.textstats import curate

    good = "the quick brown fox jumps over the lazy dog and it is in a field " * 2
    df = spark.createDataFrame(
        [
            ("d1", good + "one"),
            ("d2", good + "two"),     # same 40-char prefix as d1 -> dropped (keep-first d1)
            ("d3", "too short"),      # fails the quality gate
            ("d4", "zz " * 30),       # no stopwords -> fails gate
        ],
        "id STRING, document STRING",
    )
    out = {r.id for r in curate(df, min_words=10, dedup_prefix_chars=40).collect()}
    assert out == {"d1"}
    # sample_rate branches deterministically
    full = curate(df, min_words=10, dedup_prefix_chars=5, sample_rate=1.0)
    assert {r.id for r in full.collect()} == {"d1"}  # d1/d2 share even 5-char prefix
    again = curate(df, min_words=10, dedup_prefix_chars=40, sample_rate=0.99, salt="s")
    assert {r.id for r in again.collect()} <= {"d1"}


# --- Bloom tier ---


def _bloom_corpora(spark):
    train = _df(
        spark,
        [
            ("t1", "the quick brown fox jumps over the lazy dog"),
            ("t2", "entirely novel content with no overlap at all"),
            ("t3", "prefix words then the quick brown fox appears here"),
            ("t4", None),
        ],
    )
    eval_set = _df(spark, [("e1", "she saw the quick brown fox leap")])
    return train, eval_set


def test_bloom_contamination_superset_of_exact(spark):
    from chroma_spark.operators.decontam import bloom_contamination

    train, eval_set = _bloom_corpora(spark)
    # realistic sizing: no false positives expected -> identical to exact
    exact = {r.id: r.n_hits for r in ngram_contamination(train, eval_set, n=4).collect()}
    bloom = {
        r.id: r.n_flagged
        for r in bloom_contamination(train, eval_set, n=4, m_bits=1 << 20, n_hashes=4).collect()
    }
    assert bloom == exact == {"t1": 1, "t3": 1}
    # every exact hit is flagged at ANY sizing (Bloom never misses)
    tiny = {
        r.id: r.n_flagged
        for r in bloom_contamination(train, eval_set, n=4, m_bits=256, n_hashes=2).collect()
    }
    assert set(exact) <= set(tiny)
    assert all(tiny[k] >= exact[k] for k in exact)


def test_bloom_false_positives_are_deterministic(spark):
    from chroma_spark.operators.decontam import bloom_contamination

    train, eval_set = _bloom_corpora(spark)
    # tiny filter -> false positives are certain; they must be IDENTICAL
    # across runs and input layouts (hash-derived, not probabilistic)
    a = sorted(
        (r.id, r.n_flagged)
        for r in bloom_contamination(train, eval_set, n=4, m_bits=8, n_hashes=2).collect()
    )
    b = sorted(
        (r.id, r.n_flagged)
        for r in bloom_contamination(
            train.repartition(7), eval_set.repartition(3), n=4, m_bits=8, n_hashes=2
        ).collect()
    )
    assert a == b
    # the saturated filter flags clean doc t2 (a false positive) and extra
    # grams in t1/t3 — all hash-determined, so the exact values are stable
    assert a == [("t1", 5), ("t2", 2), ("t3", 4)]


def test_bloom_build_reuse_and_plan(spark):
    from chroma_spark.operators.decontam import bloom_build, bloom_contamination

    train, eval_set = _bloom_corpora(spark)
    words = bloom_build(eval_set, n=4, m_bits=1 << 12, n_hashes=4)
    rows = words.collect()
    # packed words: bounded by m_bits/32, bits land in the low 32 only
    assert 0 < len(rows) <= (1 << 12) // 32
    assert all(0 <= r["__w"] < (1 << 12) // 32 for r in rows)
    assert all(0 < r["__bits"] <= 0xFFFFFFFF for r in rows)
    via_prebuilt = bloom_contamination(
        train, None, n=4, m_bits=1 << 12, n_hashes=4, filter_words=words
    )
    direct = bloom_contamination(train, eval_set, n=4, m_bits=1 << 12, n_hashes=4)
    assert sorted(map(tuple, via_prebuilt.collect())) == sorted(map(tuple, direct.collect()))
    plan = direct._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan and "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Pandas" not in plan  # whole plan is JVM built-ins
