"""Behavioral tests for span-level exact dedup, C4 line cleaning, and
cluster-balanced sampling (the cross-engine value parity is covered by
test_oracle_parity via the registry; these pin the SEMANTICS)."""

from __future__ import annotations

import pandas as pd

from chroma_spark.operators.sampling import (
    sample_cluster_balanced,
    sample_cluster_balanced_sql,
)
from chroma_spark.operators.spans import repeated_span_stats, repeated_span_stats_sql
from chroma_spark.operators.textstats import c4_filter, c4_filter_sql

PASSAGE = "the quick brown fox jumps over the lazy dog today"  # 10 tokens


def _span_docs(spark):
    rows = [
        (1, f"intro one {PASSAGE} tail a"),
        (2, f"different start {PASSAGE} other ending words here"),
        (3, "totally unique text with no repeats at all whatsoever"),
        (4, "short doc"),
        (5, f"{PASSAGE} and again {PASSAGE}"),  # within-doc repeat
        (6, ""),
    ]
    return rows, spark.createDataFrame(rows, "id INT, document STRING")


def test_repeated_spans_keep_first_copy(spark):
    rows, docs = _span_docs(spark)
    out = {
        r["id"]: r
        for r in repeated_span_stats(docs, span_tokens=5).collect()
    }
    # the globally-first occurrence (doc 1) keeps the passage verbatim
    assert out[1]["n_dup_tokens"] == 0
    assert PASSAGE in out[1]["clean_text"]
    # later copies are masked as ONE merged span of exactly the passage
    assert out[2]["n_spans"] == 1
    assert out[2]["n_dup_tokens"] == 10
    assert out[2]["clean_text"] == "different start other ending words here"
    # within-doc repeats: both copies are non-first (doc 1 is the keeper)
    assert out[5]["n_spans"] == 2
    assert out[5]["clean_text"] == "and again"
    # unaffected / short / empty docs pass through whole
    assert out[3]["dup_frac"] == 0.0
    assert out[4]["n_tokens"] == 2 and out[4]["n_dup_tokens"] == 0
    assert out[6]["n_tokens"] == 0 and out[6]["clean_text"] == ""


def test_repeated_spans_matches_duckdb(spark, duck):
    rows, docs = _span_docs(spark)
    out = (
        repeated_span_stats(docs, span_tokens=5)
        .orderBy("id")
        .toPandas()
        .reset_index(drop=True)
    )
    duck.register("__span_docs", pd.DataFrame(rows, columns=["id", "document"]))
    ora = duck.execute(
        repeated_span_stats_sql("SELECT * FROM __span_docs", span_tokens=5)
        + " ORDER BY id"
    ).df()
    for c in out.columns:
        assert (out[c].values == ora[c].astype(out[c].dtype).values).all(), c


def test_c4_filter_rules(spark, duck):
    rows = [
        # kept: terminal punctuation + enough words; "short line" dropped
        (1, "This is a good long sentence here.\nshort line\nSecond proper sentence with words!\nIs this a question with many words?"),
        # javascript line dropped, page still passes on the other three
        (2, "Enable javascript to view this page.\nGood sentence with many fine words.\nAnother good one right here folks.\nThird good sentence is also here."),
        # curly brace fails the page even though lines are fine
        (3, "function() { return 1; }\nGood sentence with many fine words.\nAnother good one right here folks.\nThird fine sentence right over here."),
        # lorem ipsum fails the page
        (4, "Lorem Ipsum dolor sit amet is filler.\nGood sentence with many fine words.\nAnother good one right here folks.\nThird fine sentence right over here."),
        (5, "no terminal punctuation at all\nonly two words.\n"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "id INT, document STRING")
    out = {r["id"]: r for r in c4_filter(docs, min_line_words=5, min_lines=3).collect()}
    assert out[1]["passes"] and out[1]["n_kept_lines"] == 3
    assert "short line" not in out[1]["clean_text"]
    assert out[2]["passes"] and "javascript" not in out[2]["clean_text"]
    assert not out[3]["passes"]  # '{' code rule
    assert not out[4]["passes"]  # lorem ipsum rule
    assert not out[5]["passes"] and out[5]["clean_text"] == ""
    assert out[6]["n_lines"] == 0 and not out[6]["passes"]
    # cross-engine twin on the same rows
    pdf = (
        c4_filter(docs, min_line_words=5, min_lines=3)
        .orderBy("id")
        .toPandas()
        .reset_index(drop=True)
    )
    duck.register("__c4_docs", pd.DataFrame(rows, columns=["id", "document"]))
    ora = duck.execute(
        c4_filter_sql("SELECT * FROM __c4_docs", min_line_words=5, min_lines=3)
        + " ORDER BY id"
    ).df()
    for c in pdf.columns:
        assert (pdf[c].values == ora[c].astype(pdf[c].dtype).values).all(), c


def test_cluster_balanced_cap_and_determinism(spark, duck):
    import numpy as np

    rng = np.random.default_rng(7)
    pts = []
    for cid, (cx, cy), n in [(0, (0, 0), 50), (1, (10, 0), 20), (2, (0, 10), 5)]:
        for _ in range(n):
            pts.append(
                (len(pts), [float(cx + rng.normal(0, 0.5)), float(cy + rng.normal(0, 0.5))])
            )
    vec = spark.createDataFrame(pts, "id BIGINT, embedding ARRAY<DOUBLE>")
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    )
    out = sample_cluster_balanced(vec, cent, cap=8).toPandas()
    sizes = out.groupby("centroid_id").size().to_dict()
    # dense clusters capped, sparse cluster kept whole
    assert sizes == {0: 8, 1: 8, 2: 5}
    assert set(out["pick_rank"]) <= set(range(1, 9))
    # deterministic: same subset on re-run
    again = sample_cluster_balanced(vec, cent, cap=8).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )
    # cross-engine twin
    duck.register("__bal_vecs", pd.DataFrame(pts, columns=["id", "embedding"]))
    duck.register(
        "__bal_cents",
        pd.DataFrame(
            [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])],
            columns=["centroid_id", "centroid"],
        ),
    )
    ora = duck.execute(
        sample_cluster_balanced_sql(
            "SELECT * FROM __bal_vecs", "SELECT * FROM __bal_cents", cap=8
        )
        + " ORDER BY centroid_id, pick_rank"
    ).df()
    a = out.sort_values(["centroid_id", "pick_rank"]).reset_index(drop=True)
    for c in a.columns:
        assert (a[c].values == ora[c].astype(a[c].dtype).values).all(), c


def test_quality_classifier_trains_and_scores(spark, duck):
    """End-to-end: pyspark.ml training on weak labels separates clean text
    from symbol spam, and the TRAINED model's distributed scorer matches
    the DuckDB twin bit-for-bit (same literal weights, same md5 buckets)."""
    from chroma_spark.operators.quality_model import (
        score_quality,
        score_quality_sql,
        train_quality_classifier,
    )

    good = [
        "the committee published its annual report on regional trade",
        "researchers described a simple method for measuring rainfall",
        "the library extended its opening hours during the summer",
        "farmers in the valley rotated crops to preserve the soil",
        "the orchestra rehearsed a new arrangement of the symphony",
        "engineers tested the bridge design under heavy load",
    ]
    bad = [
        "$$$ win win win $$$ click here $$$ free free",
        "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
        "!!! buy now !!! buy now !!! buy now !!!",
        "zzz qqq zzz qqq zzz qqq zzz qqq zzz",
        "### ### ### lorem lorem ### ### ###",
        "%% off %% off %% off %% off %% off",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    docs = spark.createDataFrame(rows, "id INT, document STRING, label INT")
    model = train_quality_classifier(docs, "label", dim=512, max_iter=30)
    assert len(model["weights"]) == 512

    scored = {r["id"]: r["score"] for r in score_quality(docs, model).collect()}
    good_scores = [scored[i] for i in range(len(good))]
    bad_scores = [scored[100 + i] for i in range(len(bad))]
    assert min(good_scores) > max(bad_scores), (good_scores, bad_scores)

    # parity with the trained (not fixed) weights
    import pandas as pd

    duck.register(
        "__qm_docs", pd.DataFrame(rows, columns=["id", "document", "label"])
    )
    ora = duck.execute(
        score_quality_sql("SELECT * FROM __qm_docs", model) + " ORDER BY id"
    ).df()
    got = (
        score_quality(docs, model).orderBy("id").toPandas().reset_index(drop=True)
    )
    for c in got.columns:
        assert (got[c].values == ora[c].astype(got[c].dtype).values).all(), c


def test_quality_scoring_is_shuffle_free(spark):
    """Inference is a single projection: literal weight array, no
    Exchange, no Python stage (the 100-TB scoring path)."""
    from chroma_spark.operators.quality_model import score_quality
    from chroma_spark.registry import load

    from .conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").selectExpr(
        "doc_id AS id", "text AS document"
    )
    model = {"dim": 64, "intercept": 0.0, "weights": [0.01 * i for i in range(64)]}
    plan = score_quality(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "quality scoring must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Property test: span dedup vs a from-scratch pure-Python oracle of the
# documented semantics (every non-first occurrence of a duplicated L-gram
# is masked; merged intervals; whitespace-normalized clean text), plus the
# DuckDB twin — three independent implementations must agree.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_span_oracle(rows, L):
    """Pure-Python re-derivation of repeated_span_stats semantics."""
    occ = {}  # gram -> list[(id, pos)]
    toks_by_id = {}
    for i, text in rows:
        toks = [t for t in text.lower().split() if t]
        toks_by_id[i] = toks
        for p in range(len(toks) - L + 1):
            occ.setdefault(" ".join(toks[p : p + L]), []).append((i, p + 1))
    masked = {}
    for g, os_ in occ.items():
        if len(os_) > 1:
            keeper = min(os_)
            for o in os_:
                if o != keeper:
                    masked.setdefault(o[0], set()).add(o[1])
    out = {}
    for i, toks in toks_by_id.items():
        starts = sorted(masked.get(i, ()))
        covered = sorted({p for s in starts for p in range(s, s + L)})
        n_spans = sum(
            1 for j, s in enumerate(starts) if j == 0 or s - starts[j - 1] > L
        )
        cov = set(covered)
        clean = " ".join(t for j, t in enumerate(toks, start=1) if j not in cov)
        out[i] = (len(toks), len(covered), n_spans, clean)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_repeated_spans_three_way_property(spark, duck, data):
    vocab = ["aa", "bb", "cc", "dd"]  # tiny vocab -> dense accidental repeats
    L = data.draw(st.integers(2, 4), label="L")
    n_docs = data.draw(st.integers(1, 8), label="n_docs")
    rows = []
    for i in range(n_docs):
        toks = data.draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=12),
            label=f"doc{i}",
        )
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "id INT, document STRING")
    got = {
        r["id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["clean_text"])
        for r in repeated_span_stats(docs, span_tokens=L).collect()
    }
    expected = _py_span_oracle(rows, L)
    assert got == expected
    import pandas as pd

    duck.register("__prop_docs", pd.DataFrame(rows, columns=["id", "document"]))
    ora = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[4]), r[5])
        for r in duck.execute(
            repeated_span_stats_sql("SELECT * FROM __prop_docs", span_tokens=L)
        ).fetchall()
    }
    assert ora == expected


def test_incremental_span_index_lifecycle(spark, tmp_path):
    """Persisted span index: batch-vs-index equals the full recompute
    restricted to the batch (corpus ids order first), and append-mode
    maintenance never rewrites untouched bucket files (O(changed) in
    writes, same discipline as the dedup band index)."""
    import os

    from chroma_spark.operators.spans import (
        append_span_index,
        incremental_span_stats,
        write_span_index,
    )

    corpus_rows = [
        (1, f"intro one {PASSAGE} tail a"),
        (2, "totally unique text with no repeats at all whatsoever"),
        (3, f"prefix words {PASSAGE} more trailing content here now"),
    ]
    batch_rows = [
        (10, f"batch copy {PASSAGE} embedded right here"),  # corpus passage -> masked
        (11, "entirely new batch content nothing repeated anywhere"),
        (12, "dup dup dup one two three four five dup dup dup one two three four five"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "id INT, document STRING")
    batch = spark.createDataFrame(batch_rows, "id INT, document STRING")
    path = str(tmp_path / "span_idx")
    params = write_span_index(corpus, path, span_tokens=5, n_buckets=16)

    idx = spark.read.parquet(path)
    out = {
        r["id"]: r
        for r in incremental_span_stats(batch, idx, span_tokens=5).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[10]["n_dup_tokens"] == 10  # the corpus passage is masked
    assert PASSAGE not in out[10]["clean_text"]
    assert out[11]["n_dup_tokens"] == 0
    # within-batch keep-first: second copy of the repeated half masked
    assert out[12]["n_dup_tokens"] == 8 and out[12]["n_spans"] == 1

    # full-recompute equivalence on corpus+batch restricted to the batch
    both = corpus.unionByName(batch)
    full = {
        r["id"]: r
        for r in repeated_span_stats(both, span_tokens=5).collect()
        if r["id"] >= 10
    }
    for i in (10, 11, 12):
        assert tuple(out[i]) == tuple(full[i]), i

    # append maintenance: untouched bucket files are byte-stable
    def _files():
        stat = {}
        for root, _, fs in os.walk(path):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    stat[p] = (st.st_size, st.st_mtime_ns)
        return stat

    before = _files()
    append_span_index(batch, path, params)
    after = _files()
    assert set(before) <= set(after)  # nothing rewritten or removed
    for p, sig in before.items():
        assert after[p] == sig, f"pre-existing file rewritten: {p}"
    # and the appended index absorbs the batch: re-running the batch
    # against it now masks batch-internal duplicates as corpus hits
    idx2 = spark.read.parquet(path)
    again = {
        r["id"]: r
        for r in incremental_span_stats(batch, idx2, span_tokens=5).collect()
    }
    assert again[11]["n_dup_tokens"] > 0  # its own grams are indexed now


def test_postings_served_balance_matches_inplan_assignment(spark):
    """The postings-served balanced sampler must pick exactly the rows the
    in-plan argmin path picks when the postings hold the same assignment
    (both use the same deterministic md5 order)."""
    import numpy as np

    from chroma_spark.operators.sampling import (
        sample_cluster_balanced_from_postings,
    )

    rng = np.random.default_rng(3)
    pts = []
    for cid, (cx, cy), n in [(0, (0, 0), 30), (1, (8, 0), 12)]:
        for _ in range(n):
            pts.append(
                (len(pts), [float(cx + rng.normal(0, 0.4)), float(cy + rng.normal(0, 0.4))])
            )
    vec = spark.createDataFrame(pts, "id BIGINT, embedding ARRAY<DOUBLE>")
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [8.0, 0.0])], "centroid_id INT, centroid ARRAY<DOUBLE>"
    )
    inplan = sample_cluster_balanced(vec, cent, cap=5).toPandas()
    # derive postings from the same argmin assignment, then serve from them
    from chroma_spark.functions.distance import l2
    from chroma_spark.operators.topk import topk_per_group
    import pyspark.sql.functions as SF

    d = SF.round(l2(SF.col("embedding"), SF.col("centroid")), 6) + SF.lit(0.0)
    postings = topk_per_group(
        vec.crossJoin(SF.broadcast(cent)).select("id", "centroid_id", d.alias("__d")),
        ["id"],
        [SF.col("__d").asc(), SF.col("centroid_id").asc()],
        1,
        two_stage=False,
    ).select("centroid_id", "id")
    served = sample_cluster_balanced_from_postings(postings, cap=5).toPandas()
    key = lambda df: sorted(map(tuple, df[["centroid_id", "id", "pick_rank"]].values.tolist()))
    assert key(inplan) == key(served)
