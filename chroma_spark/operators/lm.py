"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): train a smoothed bigram LM on a reference
corpus, score every candidate document by perplexity, and gate or bucket
on the score. Low perplexity = looks like the reference distribution;
very high = gibberish / boilerplate / wrong language.

Reference parity note: chroma has no LM scoring — this is part of the
beyond-the-reference training-data-pipeline surface (SURVEY §7 phase 7),
alongside the Gopher gates and repetition stats in textstats.py.

Scale shape (100 TB): the trained model is two count tables — bigram
counts and context (first-word) counts — both bounded by the corpus's
VOCABULARY (sub-linear in corpus bytes; web-scale English bigram tables
are ~1e8-1e9 rows, far smaller than the corpus). Training is one
explode → groupBy per table (map-side partial aggregation does the heavy
lifting). Scoring aggregates each document's bigrams FIRST (so the join
carries one row per distinct (doc, bigram), not per token instance), then
shuffle-joins against the count tables on the gram string; skew is
bounded by stopword-pair frequency and AQE's skew-join handles the head.
Nothing collects to the driver: the vocabulary size V enters the plan as
a 1-row broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql, word_ngrams, word_ngrams_sql


def bigram_lm(train: DataFrame, text_col: str = "document") -> dict:
    """Train an add-k-ready bigram LM: returns ``{"bigrams": DF(gram,
    c_bi), "contexts": DF(ctx, c_ctx), "vocab": DF(v)}``. Counts are raw
    (smoothing is applied at scoring time so one trained model serves any
    ``add_k``)."""
    toks = tokens(F.col(text_col))
    grams = train.select(F.explode(word_ngrams(toks, 2)).alias("gram"))
    bigrams = grams.groupBy("gram").agg(F.count("*").alias("c_bi"))
    contexts = (
        grams.select(F.substring_index("gram", " ", 1).alias("ctx"))
        .groupBy("ctx")
        .agg(F.count("*").alias("c_ctx"))
    )
    vocab = train.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").cast("double").alias("v")
    )
    return {"bigrams": bigrams, "contexts": contexts, "vocab": vocab}


def lm_perplexity(
    docs: DataFrame,
    train: DataFrame | None = None,
    model: dict | None = None,
    add_k: float = 0.5,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Score each document's bigram perplexity under an add-k-smoothed
    bigram LM: ``(id, n_bigrams, ppl)`` with
    ``P(w|c) = (count(c w) + k) / (count(c) + k·V)`` and
    ``ppl = exp(-mean log P)`` over the document's bigram instances.
    Documents with fewer than 2 tokens get ``n_bigrams = 0, ppl = NULL``.

    Pass ``train`` (a reference corpus DataFrame) or a pre-trained
    ``model`` from :func:`bigram_lm`; defaults to training on ``docs``
    itself (self-perplexity, the CCNet in-domain setup).
    """
    if model is None:
        model = bigram_lm(train if train is not None else docs, text_col=text_col)
    k = F.lit(float(add_k))
    toks = tokens(F.col(text_col))
    doc_grams = (
        docs.select(F.col(id_col).alias("id"), F.explode(word_ngrams(toks, 2)).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("occ"))
    )
    joined = (
        doc_grams.join(model["bigrams"], "gram", "left")
        .withColumn("ctx", F.substring_index("gram", " ", 1))
        .join(model["contexts"], "ctx", "left")
        .crossJoin(F.broadcast(model["vocab"]))
    )
    logp = F.log(
        (F.coalesce(F.col("c_bi"), F.lit(0)).cast("double") + k)
        / (F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double") + k * F.col("v"))
    )
    scored = joined.groupBy("id").agg(
        F.sum("occ").cast("bigint").alias("n_bigrams"),
        (F.sum(F.col("occ").cast("double") * logp) / F.sum(F.col("occ").cast("double"))).alias(
            "_avg_logp"
        ),
    )
    out = docs.select(F.col(id_col).alias("id")).join(scored, "id", "left")
    return out.select(
        "id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        (F.round(F.exp(-F.col("_avg_logp")), 6) + F.lit(0.0)).alias("ppl"),
    )


def lm_perplexity_sql(
    docs_sql: str,
    train_sql: str | None = None,
    add_k: float = 0.5,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """DuckDB oracle twin of :func:`lm_perplexity` (self-trained form when
    ``train_sql`` is None)."""
    train_sql = train_sql if train_sql is not None else docs_sql
    toks = tokens_sql(f'"{text_col}"')
    grams = word_ngrams_sql("t", 2)
    k = repr(float(add_k))
    return f"""
WITH train_toks AS (SELECT {toks} AS t FROM ({train_sql})),
grams AS (SELECT unnest({grams}) AS gram FROM train_toks),
bi AS (SELECT gram, count(*) AS c_bi FROM grams GROUP BY 1),
ctx AS (SELECT split_part(gram, ' ', 1) AS ctx, count(*) AS c_ctx FROM grams GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
          FROM (SELECT unnest(t) AS w FROM train_toks)),
doc_grams AS (
  SELECT id, gram, count(*) AS occ
  FROM (SELECT id, unnest({grams}) AS gram
        FROM (SELECT "{id_col}" AS id, {toks} AS t FROM ({docs_sql})))
  GROUP BY 1, 2
),
scored AS (
  SELECT id,
         CAST(sum(occ) AS BIGINT) AS n_bigrams,
         sum(CAST(occ AS DOUBLE) * ln((CAST(coalesce(c_bi, 0) AS DOUBLE) + {k})
                                      / (CAST(coalesce(c_ctx, 0) AS DOUBLE) + {k} * v)))
           / sum(CAST(occ AS DOUBLE)) AS avg_logp
  FROM doc_grams
  LEFT JOIN bi USING (gram)
  LEFT JOIN ctx ON split_part(gram, ' ', 1) = ctx.ctx
  CROSS JOIN vocab
  GROUP BY 1
)
SELECT d.id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       (round(exp(-s.avg_logp), 6) + 0.0) AS ppl
FROM (SELECT "{id_col}" AS id FROM ({docs_sql})) d
LEFT JOIN scored s ON d.id = s.id"""


def lm_ppl_tiers(
    docs: DataFrame,
    train: DataFrame | None = None,
    cuts: tuple = (1 / 3, 2 / 3),
    add_k: float = 0.5,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """CCNet's actual selection step: bucket documents into
    ``head`` / ``middle`` / ``tail`` by perplexity terciles (Wenzek et al.
    §4.3 — head is the most in-domain third; pipelines typically train on
    head+middle). Returns ``(id, ppl, tier)``; docs with no bigrams get a
    NULL tier (they carry no LM evidence either way).

    Scale shape: :func:`lm_perplexity` plus ONE exact-percentile aggregate
    whose 2-value result enters the plan as a 1-row broadcast cross join —
    the tier decision is then a shuffle-free projection. Exact
    ``percentile`` is a full-sort-free JVM aggregate and is bit-identical
    to DuckDB's ``quantile_cont`` on identical inputs (probed), so the
    tier boundaries cross-check in the oracle."""
    lo, hi = float(cuts[0]), float(cuts[1])
    ppl = lm_perplexity(docs, train=train, add_k=add_k, text_col=text_col, id_col=id_col)
    cuts_df = ppl.agg(
        F.expr(f"percentile(ppl, array({lo!r}, {hi!r}))").alias("__cuts")
    ).select(F.col("__cuts")[0].alias("__c1"), F.col("__cuts")[1].alias("__c2"))
    tier = (
        F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl") <= F.col("__c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ppl.crossJoin(F.broadcast(cuts_df)).select("id", "ppl", tier.alias("tier"))


def lm_ppl_tiers_sql(
    docs_sql: str,
    train_sql: str | None = None,
    cuts: tuple = (1 / 3, 2 / 3),
    add_k: float = 0.5,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    lo, hi = float(cuts[0]), float(cuts[1])
    ppl = lm_perplexity_sql(docs_sql, train_sql, add_k=add_k, text_col=text_col, id_col=id_col)
    return f"""
WITH __ppl AS ({ppl}),
__cuts AS (SELECT quantile_cont(ppl, [{lo!r}, {hi!r}]) AS c FROM __ppl)
SELECT id, ppl,
       CASE WHEN ppl IS NULL THEN NULL
            WHEN ppl <= c[1] THEN 'head'
            WHEN ppl <= c[2] THEN 'middle'
            ELSE 'tail' END AS tier
FROM __ppl CROSS JOIN __cuts"""
