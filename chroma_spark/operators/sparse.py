"""Sparse-vector scoring: posting lists, document frequency, IDF, BM25.

Reference surface:
- SparseVector type ``chromadb/base_types.py:13-117`` (indices strictly
  ascending + values); Spark type ``STRUCT<indices ARRAY<INT>,
  values ARRAY<FLOAT>>``.
- BM25 doc-side weights (fastembed Bm25 via
  ``chromadb/utils/embedding_functions/bm25_embedding_function.py:94-130``):
  ``w(t,d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))`` with k1=1.2, b=0.75.
- Query-side IDF (``rust/worker/src/execution/operators/idf.rs:24-31``):
  ``idf(t) = ln((n - n_t + 0.5) / (n_t + 0.5) + 1)``, n_t clamped to n.
- Sparse KNN = top-k by dot product
  (``operators/sparse_index_knn.rs``, ``rust/index/src/sparse/README.md``).

Spark shape: a posting-list DataFrame ``(term, id, weight)`` built by
``explode`` — the classic inverted index as a table. Scoring joins the
(broadcast) query terms to postings, aggregates ``sum(doc_w * q_w)`` per id,
then two-stage top-k. The reference's Block-Max WAND/MaxScore pruning exists
to skip postings on a single node; in batch Spark the scan is already
parallel and the join prunes to query terms only, so pruning is partition
pruning on the term key (Catalyst handles it when postings are bucketed by
term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from .topk import topk_per_group

BM25_K1 = 1.2
BM25_B = 0.75


# ---------------------------------------------------------------------------
# Token-level statistics
# ---------------------------------------------------------------------------


def doc_frequency(docs: DataFrame, text_col: str = "document", id_col: str = "id") -> DataFrame:
    """``(term, df)``: number of documents containing each term.

    Map-side: per-document DISTINCT terms (array_distinct before explode —
    the dedup happens inside each row, not via a shuffle), then a single
    count aggregation keyed by term (map-side partial combine applies).
    """
    return (
        docs.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def doc_frequency_sql(docs_sql: str, text_col: str = "document", id_col: str = "id") -> str:
    toks = tokens_sql(f'"{text_col}"')
    return f"""
SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
  SELECT unnest(list_distinct({toks})) AS term FROM ({docs_sql})
) GROUP BY term"""


def idf_expr(df_col, n_docs_col):
    """Chroma IDF (idf.rs:24-31); n_t clamped to n."""
    nt = F.least(df_col, n_docs_col)
    return F.log((n_docs_col - nt + F.lit(0.5)) / (nt + F.lit(0.5)) + F.lit(1.0))


def idf_sql(df_expr: str, n_expr: str) -> str:
    nt = f"least({df_expr}, {n_expr})"
    return f"ln(({n_expr} - {nt} + 0.5) / ({nt} + 0.5) + 1.0)"


# ---------------------------------------------------------------------------
# BM25 top-k over raw text
# ---------------------------------------------------------------------------


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    text_col: str = "document",
    id_col: str = "id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Top-``k`` docs by BM25 against ``query_terms``; ``(id, score)``,
    score DESCENDING better (reference sparse scores are dot products;
    ordering ties break on id ascending).

    All term statistics are DataFrame aggregates — nothing is collected to
    the driver, so the same plan runs at any corpus size. avgdl is a scalar
    1-row broadcast join.
    """
    spark = docs.sparkSession
    # avgdl, tf and df are separate aggregates over the SAME tokenization;
    # Catalyst re-runs the tokenizer per subtree (no cross-aggregate scan
    # sharing). That is fine for one-shot scoring; for repeated querying at
    # scale the persisted sparse index below amortizes tokenization once.
    toks = docs.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))
    lengths = toks.select("id", F.size("toks").alias("dl"))
    n_and_avg = lengths.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    qterms = spark.createDataFrame([(t,) for t in query_terms], "term STRING")
    dfreq = (
        toks.select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    qstats = F.broadcast(
        qterms.join(dfreq, "term", "left")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "term",
            "avgdl",
            idf_expr(F.coalesce(F.col("df"), F.lit(0)), F.col("n_docs")).alias("idf"),
        )
    )
    scored = (
        tf.join(qstats, "term")
        .select(
            "id",
            (
                F.col("idf")
                * (
                    F.col("tf")
                    / (
                        F.col("tf")
                        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                    )
                )
            ).alias("contrib"),
        )
        .groupBy("id")
        .agg(F.sum("contrib").alias("score"))
    )
    if round_decimals is not None:
        scored = scored.select("id", (F.round(F.col("score"), round_decimals) + F.lit(0.0)).alias("score"))
    return topk_per_group(scored, [], [F.col("score").desc(), F.col("id").asc()], k)


def bm25_topk_sql(
    docs_sql: str,
    query_terms: list[str],
    k: int,
    text_col: str = "document",
    id_col: str = "id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    toks = tokens_sql(f'"{text_col}"')
    terms = ", ".join("('" + t.replace("'", "''") + "')" for t in query_terms)
    return f"""
WITH __docs AS ({docs_sql}),
__toks AS (SELECT "{id_col}" AS id, {toks} AS toks FROM __docs),
__stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(toks)) AS avgdl FROM __toks),
__tf AS (
  SELECT id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT id, len(toks) AS dl, unnest(toks) AS term FROM __toks
  ) GROUP BY id, dl, term
),
__qterms AS (SELECT * FROM (VALUES {terms}) AS t(term)),
__dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
    SELECT unnest(list_distinct(toks)) AS term FROM __toks
  ) GROUP BY term
),
__qstats AS (
  SELECT q.term, s.avgdl, {idf_sql('CAST(coalesce(d.df, 0) AS DOUBLE)', 's.n_docs')} AS idf
  FROM __qterms q LEFT JOIN __dfreq d ON q.term = d.term CROSS JOIN __stats s
),
__scored AS (
  SELECT id, (round(sum(idf * (tf / (tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl / avgdl)))), 6) + 0.0) AS score
  FROM __tf t JOIN __qstats q ON t.term = q.term
  GROUP BY id
)
SELECT id, score FROM (
  SELECT id, score, row_number() OVER (ORDER BY score DESC, id ASC) AS rn FROM __scored
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# SparseVector struct construction + dot-product top-k
# ---------------------------------------------------------------------------


def build_sparse(docs: DataFrame, dim: int, text_col: str = "document", id_col: str = "id") -> DataFrame:
    """``(id, sparse STRUCT<indices ARRAY<INT>, values ARRAY<FLOAT>>)``.

    Terms hash (md5-based, engine-portable) into ``dim`` buckets; values are
    bucket term frequencies. Indices strictly ascending (SparseVector
    contract, base_types.py:13-117). Pure column expressions — the
    map_from/sort dance stays inside codegen.
    """
    from ..functions.text import md5_long

    exploded = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .select("id", (md5_long(F.col("term")) % dim).cast("int").alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count("*").cast("float").alias("val"))
    )
    return (
        exploded.groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("idx", "val"))).alias("pairs"))
        .select(
            "id",
            F.struct(
                F.transform("pairs", lambda p: p["idx"]).alias("indices"),
                F.transform("pairs", lambda p: p["val"]).alias("values"),
            ).alias("sparse"),
        )
    )


def sparse_dot_topk(
    records: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "id",
    sparse_col: str = "sparse",
    query_id_col: str = "query_id",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Top-``k`` by sparse dot product per query; ``(query_id, id, score)``.

    Explode record sparse vectors into postings, join the (broadcast)
    exploded query terms on the index, sum products per (query, id) —
    the SPANN-paper posting-list join expressed as DataFrame ops
    (sparse_index_knn.rs equivalent).
    """
    postings = records.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.arrays_zip(
                F.col(f"{sparse_col}.indices").alias("idx"),
                F.col(f"{sparse_col}.values").alias("val"),
            )
        ).alias("p"),
    ).select("id", F.col("p.idx").alias("idx"), F.col("p.val").cast("double").alias("doc_w"))
    qpost = F.broadcast(
        query.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.arrays_zip(
                    F.col(f"{sparse_col}.indices").alias("idx"),
                    F.col(f"{sparse_col}.values").alias("val"),
                )
            ).alias("p"),
        ).select("query_id", F.col("p.idx").alias("idx"), F.col("p.val").cast("double").alias("q_w"))
    )
    scored = (
        postings.join(qpost, "idx")
        .groupBy("query_id", "id")
        .agg(F.sum(F.col("doc_w") * F.col("q_w")).alias("score"))
    )
    if round_decimals is not None:
        scored = scored.select(
            "query_id", "id", (F.round(F.col("score"), round_decimals) + F.lit(0.0)).alias("score")
        )
    return topk_per_group(scored, ["query_id"], [F.col("score").desc(), F.col("id").asc()], k)


# ---------------------------------------------------------------------------
# Persisted posting-list index with term-bucket partition pruning — the
# sparse analog of the IVF layout (reference sparse index blockfiles,
# rust/index/src/sparse/reader.rs: per-term posting-list reads). A query
# touches only the partitions holding its terms' buckets.
# ---------------------------------------------------------------------------


def explode_postings(
    records: DataFrame, id_col: str = "id", sparse_col: str = "sparse"
) -> DataFrame:
    """``(id, idx, doc_w)`` posting rows from SparseVector structs."""
    return records.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.arrays_zip(
                F.col(f"{sparse_col}.indices").alias("idx"),
                F.col(f"{sparse_col}.values").alias("val"),
            )
        ).alias("p"),
    ).select("id", F.col("p.idx").alias("idx"), F.col("p.val").cast("double").alias("doc_w"))


def write_sparse_index(
    postings: DataFrame, path: str, n_buckets: int = 64
) -> None:
    """Persist postings PARTITIONED BY ``bucket = idx % n_buckets``.

    At 100 TB each bucket directory holds ~1/n_buckets of the postings;
    a query's terms map to a handful of buckets, which reach the scan as
    partition filters — the sparse-index read cost is proportional to the
    query's vocabulary, not the corpus.
    """
    postings.withColumn("bucket", (F.col("idx") % n_buckets).cast("int")).repartition(
        "bucket"
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def read_sparse_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def sparse_index_topk(
    indexed_postings: DataFrame,
    query: DataFrame,
    k: int,
    n_buckets: int = 64,
    sparse_col: str = "sparse",
    query_id_col: str = "query_id",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Top-``k`` dot-product over the persisted index, reading only the
    query terms' bucket partitions (static pruning via an ``isin`` literal
    derived from the collected query terms — queries are small by contract,
    exactly like the reference's query-side plan)."""
    qpost = query.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.arrays_zip(
                F.col(f"{sparse_col}.indices").alias("idx"),
                F.col(f"{sparse_col}.values").alias("val"),
            )
        ).alias("p"),
    ).select("query_id", F.col("p.idx").alias("idx"), F.col("p.val").cast("double").alias("q_w"))
    buckets = sorted({int(r["idx"]) % n_buckets for r in qpost.select("idx").distinct().collect()})
    pruned = indexed_postings.filter(F.col("bucket").isin(buckets))
    scored = (
        pruned.join(F.broadcast(qpost), "idx")
        .groupBy("query_id", "id")
        .agg(F.sum(F.col("doc_w") * F.col("q_w")).alias("score"))
    )
    if round_decimals is not None:
        scored = scored.select(
            "query_id", "id", (F.round(F.col("score"), round_decimals) + F.lit(0.0)).alias("score")
        )
    return topk_per_group(scored, ["query_id"], [F.col("score").desc(), F.col("id").asc()], k)
