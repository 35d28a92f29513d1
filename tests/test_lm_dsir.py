"""Behavioral tests for bigram-LM perplexity (CCNet-style) and DSIR
hashed-ngram importance weights (cross-engine value parity is covered by
test_oracle_parity via the registry; these pin the SEMANTICS)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chroma_spark.operators.lm import bigram_lm, lm_perplexity, lm_perplexity_sql
from chroma_spark.operators.sampling import dsir_importance, dsir_importance_sql


def _lm_docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),  # exact repeat: in-distribution
        (3, "the dog sat on the rug"),
        (4, "zyx wvu tsr qpo nml"),  # out-of-distribution gibberish
        (5, "single"),  # < 2 tokens: no bigrams
        (6, ""),  # empty
    ]
    return spark.createDataFrame(rows, "id INT, document STRING")


def test_lm_perplexity_orders_in_vs_out_of_distribution(spark):
    out = {r["id"]: r for r in lm_perplexity(_lm_docs(spark)).collect()}
    # repeated in-distribution docs score lower ppl than unseen-gram gibberish
    assert out[1]["ppl"] == out[2]["ppl"]
    assert out[1]["ppl"] < out[4]["ppl"]
    assert out[3]["ppl"] < out[4]["ppl"]
    # short/empty docs: no bigrams, NULL ppl (the gate passes them through)
    for i in (5, 6):
        assert out[i]["n_bigrams"] == 0 and out[i]["ppl"] is None
    assert out[1]["n_bigrams"] == 5


def test_lm_perplexity_hand_value(spark):
    """One hand-computed cell: doc 'a b a b' self-trained, add_k=0.5.

    grams: a b (x2), b a (x1). contexts: a=2, b=1. V=2, k=0.5.
    P(b|a)=(2+.5)/(2+.5*2)=5/6, P(a|b)=(1+.5)/(1+.5*2)=3/4.
    avg logp = (2*ln(5/6) + ln(3/4))/3; ppl = exp(-avg).
    """
    docs = spark.createDataFrame([(1, "a b a b")], "id INT, document STRING")
    got = lm_perplexity(docs).collect()[0]
    want = math.exp(-(2 * math.log(5 / 6) + math.log(3 / 4)) / 3)
    assert got["n_bigrams"] == 3
    assert abs(got["ppl"] - round(want, 6)) < 1e-9


def test_lm_perplexity_external_train_corpus(spark):
    """Scoring against a separate reference corpus: a doc matching the
    reference scores lower than one that doesn't."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)], "id INT, document STRING"
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "purple monkey dishwasher")], "id INT, document STRING"
    )
    out = {r["id"]: r["ppl"] for r in lm_perplexity(docs, train=train).collect()}
    assert out[1] < out[2]
    # pre-trained model object gives identical scores
    model = bigram_lm(train)
    out2 = {r["id"]: r["ppl"] for r in lm_perplexity(docs, model=model).collect()}
    assert out == out2


def test_lm_perplexity_matches_duckdb(spark, duck):
    docs = _lm_docs(spark)
    duck.execute("CREATE OR REPLACE TABLE _lm AS SELECT * FROM (VALUES "
                 + ", ".join(f"({r['id']}, '{r['document']}')" for r in docs.collect())
                 + ") t(id, document)")
    got = sorted(
        (r["id"], r["n_bigrams"], r["ppl"]) for r in lm_perplexity(docs).collect()
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in duck.execute(lm_perplexity_sql("SELECT id, document FROM _lm")).fetchall()
    )
    assert got == want


def test_dsir_weights_favor_target_like_docs(spark):
    target_text = "alpha beta gamma delta alpha beta"
    rows = [(i, target_text, "tgt") for i in range(20)]
    rows += [(100, "alpha beta gamma words", "raw")]  # target-like raw doc
    rows += [(101, "unrelated junk tokens here", "raw")]
    rows += [(102, "", "raw")]
    docs = spark.createDataFrame(rows, "id INT, document STRING, source STRING")
    out = {
        r["id"]: r
        for r in dsir_importance(
            docs, target=F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    # only raw rows come back
    assert sorted(out) == [100, 101, 102]
    # the target-like raw doc outranks the unrelated one
    assert out[100]["weight"] > out[101]["weight"]
    # featureless doc: 0 feats, NULL weight
    assert out[102]["n_feats"] == 0 and out[102]["weight"] is None
    # n_feats = unigram + bigram instances = 4 + 3
    assert out[100]["n_feats"] == 7


def test_dsir_matches_duckdb(spark, duck):
    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the dog ran in the park", "a"),
        (3, "stocks rallied on earnings news", "b"),
        (4, "the cat ran in the mat", "b"),
        (5, "", "b"),
    ]
    docs = spark.createDataFrame(rows, "id INT, document STRING, source STRING")
    duck.execute("CREATE OR REPLACE TABLE _dsir AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{t}', '{s}')" for i, t, s in rows)
                 + ") t(id, document, source)")
    got = sorted(
        (r["id"], r["n_feats"], r["weight"])
        for r in dsir_importance(docs, target=F.col("source") == "a", n_buckets=32).collect()
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in duck.execute(
            dsir_importance_sql(
                "SELECT id, document, source FROM _dsir", "source = 'a'", n_buckets=32
            )
        ).fetchall()
    )
    assert len(got) == 3
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        if g[2] is None:
            assert w[2] is None
        else:
            assert abs(g[2] - w[2]) < 1e-9


def test_lm_and_dsir_plans_have_no_cartesian_blowup(spark):
    """Plan pins: the only cross joins are the 1-row broadcast scalars
    (vocab / totals); count tables join by key."""
    docs = _lm_docs(spark)
    plan = lm_perplexity(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    out = dsir_importance(docs, target=F.col("id") < 3, n_buckets=16)
    plan2 = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2


def test_gumbel_topk_sample_is_weight_biased_and_deterministic(spark):
    from chroma_spark.operators.sampling import gumbel_topk_sample

    # 200 rows, half with weight +2 half with -2: the sample should be
    # dominated by the heavy half (exp(4) ~ 55x likelier per row)
    rows = [(i, 2.0 if i % 2 == 0 else -2.0) for i in range(200)]
    rows.append((500, None))  # featureless: excluded
    df = spark.createDataFrame(rows, "id INT, weight DOUBLE")
    out = gumbel_topk_sample(df, k=50).collect()
    assert len(out) == 50
    assert [r["sample_rank"] for r in sorted(out, key=lambda r: r["sample_rank"])] == list(range(1, 51))
    heavy = sum(1 for r in out if r["weight"] == 2.0)
    assert heavy >= 45
    assert all(r["id"] != 500 for r in out)
    # deterministic: identical draw on re-run; different salt, different draw
    again = gumbel_topk_sample(df, k=50).collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in out)
    other = gumbel_topk_sample(df, k=50, salt="other").collect()
    assert sorted(r["id"] for r in other) != sorted(r["id"] for r in out)


def test_gumbel_topk_matches_duckdb(spark, duck):
    from chroma_spark.operators.sampling import gumbel_topk_sample, gumbel_topk_sample_sql

    rows = [(i, (i % 7) * 0.37 - 1.0) for i in range(60)]
    df = spark.createDataFrame(rows, "id INT, weight DOUBLE")
    got = [
        (r["id"], r["weight"], r["sample_rank"])
        for r in gumbel_topk_sample(df, k=10).orderBy("sample_rank").collect()
    ]
    duck.execute(
        "CREATE OR REPLACE TABLE _gum AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {w!r}::DOUBLE)" for i, w in rows)
        + ") t(id, weight)"
    )
    want = duck.execute(gumbel_topk_sample_sql("SELECT id, weight FROM _gum", k=10)).fetchall()
    assert got == [(r[0], r[1], r[2]) for r in want]


def test_lm_ppl_tiers_terciles(spark):
    from chroma_spark.operators.lm import lm_ppl_tiers

    # ppl decreases with i: more copies of the corpus-dominant phrase dilute
    # the doc's one rare bigram -> 90 distinct ppl values
    rows = [(i, "the cat sat on the mat " * (i + 1) + f"x{i} y{i}")
            for i in range(90)]
    rows.append((1000, "x"))  # no bigram evidence -> NULL tier
    docs = spark.createDataFrame(rows, "id INT, document STRING")
    out = lm_ppl_tiers(docs).collect()
    tiers = {}
    for r in out:
        tiers[r["tier"]] = tiers.get(r["tier"], 0) + 1
    # terciles split the scored docs roughly in thirds; the no-evidence doc
    # is untiered
    assert tiers[None] == 1
    assert abs(tiers["head"] - 30) <= 2 and abs(tiers["tail"] - 30) <= 2
    # every head ppl <= every middle ppl <= every tail ppl
    by_tier = {t: [r["ppl"] for r in out if r["tier"] == t] for t in ("head", "middle", "tail")}
    assert max(by_tier["head"]) <= min(by_tier["middle"]) <= max(by_tier["middle"]) <= min(by_tier["tail"])


def _py_lm_perplexity(rows, add_k=0.5):
    """Pure-Python third twin of lm_perplexity (the where/rank/span test
    discipline): independent implementation, same semantics."""
    def toks(t):
        return [w for w in (t or "").lower().split() if w]

    grams, ctxs, vocab = {}, {}, set()
    for _, t in rows:
        ts = toks(t)
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            grams[(a, b)] = grams.get((a, b), 0) + 1
            ctxs[a] = ctxs.get(a, 0) + 1
    v = float(len(vocab))
    out = {}
    for i, t in rows:
        ts = toks(t)
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        s = sum(
            math.log((grams.get(p, 0) + add_k) / (ctxs.get(p[0], 0) + add_k * v))
            for p in pairs
        )
        out[i] = (len(pairs), round(math.exp(-s / len(pairs)), 6) + 0.0)
    return out


def test_lm_perplexity_three_way_property(spark, duck):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["the", "cat", "dog", "sat", "ran", "a", "zz", "q1"])
    doc = st.lists(words, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(doc, min_size=1, max_size=8))
    def inner(docs):
        rows = list(enumerate(docs))
        expected = _py_lm_perplexity(rows)
        df = spark.createDataFrame(rows, "id INT, document STRING")
        got = {r["id"]: (r["n_bigrams"], r["ppl"]) for r in lm_perplexity(df).collect()}
        duck.execute(
            "CREATE OR REPLACE TABLE _lmp AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in rows)
            + ") t(id, document)")
        orc = {r[0]: (r[1], r[2]) for r in duck.execute(
            lm_perplexity_sql("SELECT id, document FROM _lmp")).fetchall()}
        for i, (n, p) in expected.items():
            for name, other in (("spark", got[i]), ("duck", orc[i])):
                assert other[0] == n, (name, i, other, (n, p))
                if p is None:
                    assert other[1] is None, (name, i)
                else:
                    assert abs(other[1] - p) < 1e-9, (name, i, other, (n, p))

    inner()
