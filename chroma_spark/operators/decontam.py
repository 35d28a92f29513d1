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

from ..functions.text import tokens, tokens_sql, word_ngrams, word_ngrams_sql


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
