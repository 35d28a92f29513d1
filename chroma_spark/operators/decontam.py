"""Train/eval decontamination — n-gram overlap against a benchmark set.

The standard LLM training-data hygiene step (GPT-3 appendix C / C4 /
The Pile all ship a variant): a training document is contaminated when it
shares at least one word n-gram with any document in the evaluation set.
Beyond the reference surface (SURVEY §2 has no decontamination operator;
this is part of the training-data pipeline tier).

Spark shape, sized for 100 TB of train against a benchmark set that is
small by construction (benchmark suites are MBs):

- n-grams are deduplicated INSIDE each row (``array_distinct`` before
  ``explode``) so no shuffle pays for repeated phrases;
- the eval n-gram set builds on the small side and BROADCASTS into a semi
  join — the train corpus is scanned once and never shuffles for the join;
- the only shuffle is the final per-document aggregation, keyed by doc id.

Both sides tokenize with the shared ``functions.text`` primitives, so the
DuckDB oracle recomputes identical n-grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql, tokens, tokens_sql, word_ngrams, word_ngrams_sql


def _doc_ngrams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))).alias("__ng"),
    )


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """``(id, n_hits)`` for every train document sharing >= 1 word n-gram
    with the eval set; ``n_hits`` = number of DISTINCT contaminated
    n-grams in that document. Filter/anti-join the result against the
    corpus to drop or audit contaminated records."""
    ev = eval_set.select(
        F.explode(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))).alias("__ng")
    ).distinct()
    hits = _doc_ngrams(train, n, text_col, id_col).join(F.broadcast(ev), "__ng", "semi")
    return hits.groupBy("__id").agg(F.count("*").alias("n_hits")).select(
        F.col("__id").alias(id_col), F.col("n_hits")
    )


def ngram_contamination_sql(
    train_sql: str,
    eval_sql: str,
    n: int = 13,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    toks = tokens_sql(f'"{text_col}"')
    ngrams = word_ngrams_sql("toks", n)
    return f"""
WITH __tr AS (
  SELECT "{id_col}" AS id, unnest(list_distinct({ngrams})) AS ng
  FROM (SELECT "{id_col}", {toks} AS toks FROM ({train_sql}))
),
__ev AS (
  SELECT DISTINCT unnest(list_distinct({ngrams})) AS ng
  FROM (SELECT {toks} AS toks FROM ({eval_sql}))
)
SELECT t.id AS "{id_col}", CAST(count(*) AS BIGINT) AS n_hits
FROM __tr t JOIN __ev e ON t.ng = e.ng
GROUP BY t.id"""


# ---------------------------------------------------------------------------
# Bloom-filter tier: decontamination when the eval set is too big to
# broadcast as raw n-gram strings
# ---------------------------------------------------------------------------
#
# The semi-join above broadcasts the eval n-grams THEMSELVES — fine for
# benchmark suites (MBs), wrong when decontaminating against something like
# a full held-out split (billions of grams). The Bloom tier bounds the
# broadcast at m_bits/8 bytes NO MATTER how big the eval set is: eval grams
# hash to n_hashes positions in an m_bits-bit filter, the filter is built
# by a distributed bit_or aggregation into 32-bit words (m_bits/32 rows,
# all JVM built-ins), and train-side membership is a broadcast equi-join on
# the word index plus a shift-and-mask — no UDF anywhere, so the whole plan
# is whole-stage-codegen.
#
# False positives are PART OF THE SEMANTICS and fully deterministic: the
# positions are md5-derived (functions/text.md5_long, the repo-wide
# cross-engine hash), so a given (m_bits, n_hashes) flags exactly the same
# grams in every engine/run/layout. The DuckDB twin recomputes membership
# as a position-set join — provably identical to the packed-word test,
# because packing the distinct position set into words is lossless for
# membership. Classic trade: n_flagged here is a deterministic SUPERSET of
# ngram_contamination's n_hits (never a miss), with FP rate
# ~ (1 - e^(-k*n_grams/m))^k.


def _bloom_pos(j, ng, m_bits: int):
    """Position j of an n-gram in the filter (identical text in both
    engines): md5_long('bf' || j || ':' || gram) % m_bits."""
    return md5_long(
        F.concat(F.lit("bf"), j.cast("string"), F.lit(":"), ng)
    ) % F.lit(int(m_bits))


def _bloom_pos_sql(j_sql: str, ng_sql: str, m_bits: int) -> str:
    h = md5_long_sql(f"('bf' || CAST({j_sql} AS VARCHAR) || ':' || {ng_sql})")
    return f"({h} % {int(m_bits)})"


def bloom_build(
    eval_set: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "document",
) -> DataFrame:
    """Build the eval-set filter as packed words: ``(__w LONG word index,
    __bits LONG with bits 0..31 used)``. ``m_bits/32`` rows regardless of
    eval size — the bounded broadcast artifact. Mergeable across corpora
    (union then re-bit_or), and cheap to persist next to a collection."""
    grams = eval_set.select(
        F.explode(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))).alias("__ng")
    )
    pos = grams.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(n_hashes) - 1))).alias("__j"), "__ng"
    ).select(_bloom_pos(F.col("__j"), F.col("__ng"), m_bits).alias("__pos"))
    return pos.groupBy(F.shiftright("__pos", 5).alias("__w")).agg(
        F.bit_or(F.expr("CAST(shiftleft(1, CAST(__pos % 32 AS INT)) AS BIGINT)")).alias("__bits")
    )


def bloom_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "document",
    id_col: str = "id",
    filter_words: DataFrame | None = None,
) -> DataFrame:
    """``(id, n_flagged)`` for every train document with >= 1 n-gram whose
    ``n_hashes`` filter positions are ALL set — a deterministic superset of
    :func:`ngram_contamination` (same output shape; ``n_flagged`` counts
    distinct flagged grams). Pass ``filter_words`` (from
    :func:`bloom_build`) to reuse a prebuilt/persisted filter.

    Scale shape: train scans once; per distinct-in-doc gram, ``n_hashes``
    position rows broadcast-join the m_bits/32-row word table (inner join:
    positions in absent words are misses by construction); one (id, gram)
    all-positions-hit aggregate, then the per-doc count. The only shuffles
    are keyed by (id, gram) and id."""
    words = filter_words if filter_words is not None else bloom_build(
        eval_set, n=n, m_bits=m_bits, n_hashes=n_hashes, text_col=text_col
    )
    trp = _doc_ngrams(train, n, text_col, id_col).select(
        "__id",
        "__ng",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_hashes) - 1))).alias("__j"),
    ).select(
        "__id", "__ng", _bloom_pos(F.col("__j"), F.col("__ng"), m_bits).alias("__pos")
    )
    probed = trp.join(
        F.broadcast(words), F.shiftright(trp["__pos"], 5) == words["__w"], "inner"
    ).filter(F.expr("(shiftright(__bits, CAST(__pos % 32 AS INT)) & 1) = 1"))
    flagged = (
        probed.groupBy("__id", "__ng")
        .agg(F.count("*").alias("__nh"))
        .filter(F.col("__nh") == int(n_hashes))
    )
    return flagged.groupBy("__id").agg(F.count("*").alias("n_flagged")).select(
        F.col("__id").alias(id_col), "n_flagged"
    )


def bloom_contamination_sql(
    train_sql: str,
    eval_sql: str,
    n: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """DuckDB twin: membership as a join against the DISTINCT eval position
    set (lossless equivalent of the packed-word test)."""
    toks = tokens_sql(f'"{text_col}"')
    ngrams = word_ngrams_sql("toks", n)
    pos = _bloom_pos_sql("j", "ng", m_bits)
    return f"""
WITH __js AS (SELECT unnest(range({int(n_hashes)})) AS j),
__ev AS (
  SELECT DISTINCT {pos} AS pos
  FROM (
    SELECT unnest(list_distinct({ngrams})) AS ng
    FROM (SELECT {toks} AS toks FROM ({eval_sql}))
  ), __js
),
__tr AS (
  SELECT id, ng, {pos} AS pos
  FROM (
    SELECT "{id_col}" AS id, unnest(list_distinct({ngrams})) AS ng
    FROM (SELECT "{id_col}", {toks} AS toks FROM ({train_sql}))
  ), __js
),
__flagged AS (
  SELECT t.id, t.ng
  FROM __tr t JOIN __ev e ON t.pos = e.pos
  GROUP BY t.id, t.ng
  HAVING count(*) = {int(n_hashes)}
)
SELECT id AS "{id_col}", CAST(count(*) AS BIGINT) AS n_flagged
FROM __flagged GROUP BY id"""
