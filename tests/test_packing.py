"""Sequence packing + token entropy semantics (operators/textstats.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_pack_sequences_concat_and_chunk(spark):
    """Documents lay end to end in id order; sequences cut every `budget`
    tokens; documents span cuts (LLM pretraining packing semantics)."""
    from chroma_spark.operators.textstats import pack_sequences

    docs = spark.createDataFrame(
        [
            ("a", "one two three"),            # 3 tokens, cum_before 0
            ("b", "four five six seven"),      # 4 tokens, cum_before 3
            ("c", "eight nine"),               # 2 tokens, cum_before 7 -> seq 1
            ("d", "ten"),                      # 1 token,  cum_before 9 -> seq 1
            ("e", ""),                         # 0 tokens, cum_before 10 -> seq 2
            ("f", "x " * 7),                   # 7 tokens, cum_before 10 -> seq 2
        ],
        "id STRING, document STRING",
    )
    out = {r.id: (r.n_tokens, r.seq_id, r.seq_offset)
           for r in pack_sequences(docs, budget=5).collect()}
    assert out == {
        "a": (3, 0, 0),
        "b": (4, 0, 3),   # spans the seq0/seq1 cut
        "c": (2, 1, 2),
        "d": (1, 1, 4),
        "e": (0, 2, 0),
        "f": (7, 2, 0),
    }


def test_pack_sequences_partition_carry(spark):
    """The distributed prefix sum carries across range partitions: total
    offsets are a permutation-free exact cumsum for many small docs."""
    from chroma_spark.operators.textstats import pack_sequences

    n = 500
    docs = spark.createDataFrame(
        [(f"{i:04d}", "tok " * ((i % 7) + 1)) for i in range(n)],
        "id STRING, document STRING",
    )
    rows = sorted(pack_sequences(docs, budget=97).collect(), key=lambda r: r.id)
    cum = 0
    for r in rows:
        assert (r.seq_id, r.seq_offset) == (cum // 97, cum % 97), r.id
        cum += r.n_tokens


def test_token_entropy_values(spark):
    from chroma_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            ("uniform", "a b c d"),      # 4 distinct -> log2(4) = 2
            ("repeat", "a a a a"),       # 1 distinct -> 0
            ("mixed", "a a b b b c"),    # -(2/6 lg 2/6 + 3/6 lg 3/6 + 1/6 lg 1/6)
            ("empty", ""),
        ],
        "id STRING, document STRING",
    )
    got = {r.id: (r.n_tokens, r.entropy) for r in token_entropy(docs).collect()}
    assert got["uniform"] == (4, 2.0)
    assert got["repeat"] == (4, 0.0)
    expected = -(2/6 * math.log2(2/6) + 3/6 * math.log2(3/6) + 1/6 * math.log2(1/6))
    assert abs(got["mixed"][1] - round(expected, 6)) < 1e-9
    assert got["empty"] == (0, 0.0)


def test_pack_sequences_multifile_boundary_stability(spark, tmp_path):
    """Regression: on a MULTI-FILE input, repartitionByRange samples its
    boundaries per execution — without freezing the partitioning, the
    totals job and the output job could split ids differently and
    mis-carry every offset after the first divergent boundary (caught at
    1M by pack_materialize's conservation check). Starts must equal the
    true global prefix sum."""
    from pyspark.sql import Window

    from chroma_spark.operators.textstats import pack_materialize, pack_sequences

    n = 4000
    docs = (
        spark.range(n)
        .select(
            "id",
            F.concat_ws(
                " ", F.transform(F.sequence(F.lit(1), (F.col("id") % 37 + 3).cast("int")), lambda i: F.concat(F.lit("w"), i.cast("string")))
            ).alias("document"),
        )
        .repartition(16)  # multi-partition, hash-shuffled input order
    )
    path = str(tmp_path / "multifile_docs")
    docs.write.parquet(path)
    docs = spark.read.parquet(path)

    ps = pack_sequences(docs, budget=64)
    chk = ps.select("id", "n_tokens", (F.col("seq_id") * 64 + F.col("seq_offset")).alias("start"))
    w = Window.orderBy("id")
    bad = (
        chk.withColumn(
            "expect", F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0))
        )
        .filter(F.col("start") != F.col("expect"))
        .count()
    )
    assert bad == 0

    total = docs.select(F.sum(F.size(F.split(F.col("document"), " "))).alias("t")).collect()[0].t
    rows = sorted(pack_materialize(docs, budget=64).collect(), key=lambda r: r.seq_id)
    assert sum(r.seq_len for r in rows) == total
    assert all(r.seq_len == 64 for r in rows[:-1]) and rows[-1].seq_len <= 64
