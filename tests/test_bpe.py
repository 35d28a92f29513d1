"""BPE tokenizer: the chained-replace segmentation must agree with the
pure-Python left-to-right merge reference on arbitrary words and merge
lists, training must be self-consistent with application, and the
distinct-word join must reassemble documents in order.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from chroma_spark.operators import bpe as B

from .conftest import SF_SMALL


def _py_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word.replace(B.SEP, "")) + [B.EOW]
    for m in merges:
        syms = B._merge_seq(syms, m)
    return syms


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("id"), F.col("text").alias("document"))
    )


def test_segment_matches_python_reference_on_random_words(spark):
    """200 random words x 3 random merge programs: the Catalyst replace
    chain must equal the array-form left-to-right reference exactly."""
    rnd = random.Random(11)
    alphabet = "abcde"
    words = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 12))) for _ in range(200)]
    for trial in range(3):
        # random merge program over symbols reachable from earlier merges
        symbols = list(alphabet) + [B.EOW]
        merges: list[tuple[str, str]] = []
        for _ in range(12):
            a, b = rnd.choice(symbols), rnd.choice(symbols)
            merges.append((a, b))
            symbols.append(a + b)
        df = spark.createDataFrame([(w,) for w in words], "w STRING").withColumn(
            "syms", B.segment(F.col("w"), merges)
        )
        got = {r.w: list(r.syms) for r in df.collect()}
        for w in set(words):
            assert got[w] == _py_segment(w, merges), (trial, w, merges)


def test_segment_whole_symbol_anchoring_regression(spark):
    """The prefix-encoding bug this module was almost shipped with: after
    ('n','</w>') creates symbol 'n</w>', a later ('i','n') must NOT match
    the 'n' prefix inside 'n</w>'."""
    merges = [("n", B.EOW), ("i", "n")]
    row = (
        spark.range(1)
        .select(B.segment(F.lit("join"), merges).alias("s"))
        .collect()[0]
    )
    assert list(row.s) == ["j", "o", "i", "n</w>"]
    # and a run of the same pair still merges left-to-right
    row2 = (
        spark.range(1)
        .select(B.segment(F.lit("aaa"), [("a", "a")]).alias("s"))
        .collect()[0]
    )
    assert list(row2.s) == ["aa", "a", B.EOW]


def test_segment_round_trips_and_strips_sep(spark):
    merges = [("a", "b"), ("ab", "c")]
    words = ["abc", "abcabc", f"a{B.SEP}bc", "zzz", "a"]
    df = spark.createDataFrame([(w,) for w in words], "w STRING").withColumn(
        "syms", B.segment(F.col("w"), merges)
    )
    for r in df.collect():
        joined = "".join(r.syms)
        assert joined == r.w.replace(B.SEP, "") + B.EOW, r.w


def test_train_is_deterministic_and_self_consistent(spark):
    """Tokenizing a SEEN word must reproduce the trainer's final vocab
    segmentation (the train/apply order-semantics contract), and two
    trainings of the same corpus must learn identical merges."""
    docs = _docs(spark, SF_SMALL)
    wf = B.word_frequencies(docs)
    merges, vocab = B.train_local(wf, 16)
    merges2, _ = B.train_local(list(wf), 16)
    assert merges == merges2 and len(merges) == 16
    segs = (
        docs.select(F.explode(B.tokens(F.col("document"))).alias("w"))
        .distinct()
        .withColumn("syms", B.segment(F.col("w"), merges))
        .collect()
    )
    assert len(segs) > 0
    for r in segs:
        assert list(r.syms) == vocab[r.w], r.w


def test_more_merges_never_increase_token_count(spark):
    docs = _docs(spark, SF_SMALL)
    merges = B.bpe_train(docs, 16)
    n8 = B.bpe_token_counts(docs, merges[:8]).agg(F.sum("n_bpe")).collect()[0][0]
    n16 = B.bpe_token_counts(docs, merges).agg(F.sum("n_bpe")).collect()[0][0]
    n0 = B.bpe_token_counts(docs, []).agg(F.sum("n_bpe")).collect()[0][0]
    assert n16 <= n8 <= n0


def test_tokenize_reassembles_in_word_order(spark):
    df = spark.createDataFrame([(1, "cab abc"), (2, ""), (3, "abc")], "id LONG, document STRING")
    out = {r.id: list(r.bpe_tokens) for r in B.bpe_tokenize(df, [("a", "b")]).collect()}
    assert out[1] == ["c", "ab", B.EOW, "ab", "c", B.EOW]
    assert out[3] == ["ab", "c", B.EOW]
    assert 2 not in out  # no tokens -> no row; bpe_token_counts restores it
    counts = {r.id: (r.n_words, r.n_bpe, r.head) for r in B.bpe_token_counts(df, [("a", "b")]).collect()}
    assert counts[2] == (0, 0, "")
    assert counts[1] == (2, 6, "c ab </w> ab c </w>")


def test_registry_bpe_plans_have_no_python_udf(spark):
    """The apply path is plan literals + joins: no BatchEvalPython /
    ArrowEvalPython stage may appear."""
    from chroma_spark.registry import QUERIES

    for name in ("bpe_token_counts", "bpe_vocab_topk"):
        plan = QUERIES[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, name


def test_pack_sequences_by_bpe_counts(spark):
    """n_tokens_col packs by the supplied per-doc length: cumulative
    offsets follow BPE counts, not whitespace counts."""
    from chroma_spark.operators.bpe import bpe_token_counts
    from chroma_spark.operators.textstats import pack_sequences

    df = spark.createDataFrame(
        [(1, "abc abc abc"), (2, "zz"), (3, "abc")], "id LONG, document STRING"
    )
    counts = bpe_token_counts(df, [("a", "b"), ("ab", "c")]).select("id", "n_bpe")
    out = {r.id: r for r in pack_sequences(counts, budget=5, n_tokens_col="n_bpe").collect()}
    # doc1: 3 words x [abc,</w>] = 6 symbols; doc2: z z </w> = 3; doc3: 2
    assert (out[1].n_tokens, out[2].n_tokens, out[3].n_tokens) == (6, 3, 2)
    assert (out[1].seq_id, out[1].seq_offset) == (0, 0)
    assert (out[2].seq_id, out[2].seq_offset) == (1, 1)   # starts at token 6
    assert (out[3].seq_id, out[3].seq_offset) == (1, 4)   # starts at token 9


def test_pack_materialize_reconstructs_token_stream(spark):
    """Concatenating the materialized sequences in seq_id order must
    reproduce the corpus token stream in id order exactly; every sequence
    but the last is budget-sized."""
    from chroma_spark.operators.textstats import pack_materialize

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g"), (3, ""), (4, "h i j k")],
        "id LONG, document STRING",
    )
    rows = sorted(pack_materialize(df, budget=3).collect(), key=lambda r: r.seq_id)
    assert [r.seq_len for r in rows] == [3, 3, 3, 2]
    stream = " ".join(r.seq_text for r in rows)
    assert stream == "a b c d e f g h i j k"
