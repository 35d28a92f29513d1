"""Trainable quality classifier — the fastText-style linear filter of the
CCNet / GPT-3 data pipelines (Joulin et al. 2016; public recipe: hashed
bag-of-n-gram features into a linear model, score every document, keep the
high end). Chroma has no counterpart; this is training-data pipeline
surface on the same engine.

Design for cross-engine determinism and 100-TB scale:

- Features are md5-hashed token buckets (``md5_long(token) % dim``) — NOT
  Spark's murmur ``HashingTF`` — so the DuckDB oracle computes bit-equal
  features, and a model trained once scores identically everywhere.
- INFERENCE is pure column math: the weight vector becomes a plan literal
  array and the score is ``sigmoid(intercept + mean-normalized bucket-count
  dot weights)`` via ``aggregate``/``transform`` — no UDF, no shuffle, one
  projection over the scan (the 100-TB path; plan-pinned shuffle-free).
- TRAINING runs on a labeled sample via ``pyspark.ml`` LogisticRegression
  (L-BFGS, distributed gradient aggregation). Feature assembly stays
  JVM-side end to end: the hashed histogram densifies with higher-order
  functions and crosses into ml-vector land via
  ``pyspark.ml.functions.array_to_vector`` — no Python boundary anywhere
  in the fit. Weak labels in practice come from an upstream gate (e.g.
  :func:`~.textstats.gopher_quality` passes vs fails, or a
  curated-vs-crawl source split). Densification is training-only
  (dim doubles per SAMPLE row); inference never materializes features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql, tokens, tokens_sql


def _bucket_counts(docs: DataFrame, dim: int, text_col: str, id_col: str) -> DataFrame:
    """(id, buckets) where buckets is the md5-hashed token histogram as a
    sorted sparse (index, cnt) pair list — built with one explode +
    partial-aggregated groupBy keyed by (id, bucket)."""
    b = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", (md5_long(F.col("tok")) % dim).cast("int").alias("bucket"))
    return (
        b.groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("bucket", "cnt"))).alias("sparse"),
            F.sum("cnt").alias("n_tok"),
        )
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    dim: int = 2048,
    reg_param: float = 1e-4,
    max_iter: int = 50,
    text_col: str = "document",
    id_col: str = "id",
) -> "dict":
    """Fit the linear quality model on labeled docs (``label_col`` in
    {0, 1}); returns ``{"weights": [...dim floats...], "intercept": f,
    "dim": dim}`` — plain Python, ready for :func:`score_quality` on any
    engine. Features are token-frequency (bucket count / doc tokens), the
    same normalization inference uses."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = _bucket_counts(docs, dim, text_col, id_col).join(
        docs.select(
            F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("label")
        ),
        "id",
    )
    hist = F.map_from_entries(F.col("sparse"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(hist, i.cast("int")), F.lit(0)).cast("double")
        / F.col("n_tok"),
    )
    train = feats.select("label", array_to_vector(dense).alias("features"))
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train)
    return {
        "weights": [float(w) for w in model.coefficients.toArray()],
        "intercept": float(model.intercept),
        "dim": dim,
    }


def score_quality(
    docs: DataFrame,
    model: "dict",
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Score every doc with a trained (or fixed) linear model:
    ``(id, n_tokens, score)`` with ``score = round(sigmoid(intercept +
    sum_t w[h(t)] / n_tokens), 6)``. The weight vector is a literal array
    in the plan — shuffle-free single projection, identical in the SQL
    twin. Empty docs score ``sigmoid(intercept)``."""
    dim = int(model["dim"])
    w = F.array(*[F.lit(float(x)) for x in model["weights"]])
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    contrib = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(w, (md5_long(t) % dim).cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = F.lit(float(model["intercept"])) + F.when(n > 0, contrib / n).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        (F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6) + F.lit(0.0)).alias("score"),
    )


def score_quality_sql(
    docs_sql: str,
    model: "dict",
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """DuckDB twin of :func:`score_quality` (same literal weights, same
    md5 bucketing, same fold order per token list)."""
    dim = int(model["dim"])
    weights = "[" + ", ".join(repr(float(x)) for x in model["weights"]) + "]"
    toks = tokens_sql(f'"{text_col}"')
    h = md5_long_sql("t")
    return f"""
WITH __t AS (
  SELECT "{id_col}" AS id, {toks} AS toks, {weights}::DOUBLE[] AS w
  FROM ({docs_sql})
),
__z AS (
  SELECT id, len(toks) AS n,
         {float(model["intercept"])!r} + CASE WHEN len(toks) > 0
           THEN list_sum(list_transform(toks, t -> w[CAST({h} % {dim} AS INT) + 1]))
                / len(toks)
           ELSE 0.0 END AS z
  FROM __t
)
SELECT id, CAST(n AS BIGINT) AS n_tokens,
       (round(1.0 / (1.0 + exp(-z)), 6) + 0.0) AS score
FROM __z"""
