"""Span-level exact deduplication (ExactSubstr-style).

Doc-level dedup (minhash/simhash, ``operators/dedup.py``) removes whole
near-identical documents; this pass removes *repeated passages* inside
otherwise-distinct documents — the boilerplate / quoted-block problem of
pre-training corpora (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", which does it with suffix arrays on one machine).
The Spark-distributed equivalent for a fixed span length ``L``: any
duplicated substring of >= L tokens contains a duplicated L-token window,
so marking every non-first occurrence of each globally-duplicated L-gram
and merging the marked windows per document yields the duplicated-passage
mask exactly, with plain shuffles instead of a suffix array.

Physical shape (scale notes):
- One posexplode of the corpus into (id, pos, gram-hash) — same row count
  as minhash shingling.
- Duplicate detection is a hash groupBy with map-side partial
  aggregation (NOT a window over the gram partition: a boilerplate gram
  occurring 10M times would put 10M rows in one window partition; the
  groupBy keeps the skewed key's partials distributed and only the final
  (cnt, keeper) pair lands on one reducer).
- The keeper (first occurrence, min (id, pos) — the copy that stays
  unmasked) comes from ``min(struct(id, pos))`` in the same aggregation.
- The join back to occurrences fans out by occurrence count — inherent to
  producing the mask — and is AQE-skew-join eligible.
- Per-doc interval merge is pure higher-order functions on arrays bounded
  by document length; no UDFs, no driver state.

The cleaned text is whitespace-normalized (tokens re-joined with single
spaces), consistent with ``chunk_documents``. Reference behavior parity:
chroma has no span dedup; this is part of the training-data pipeline
surface built on the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    md5_long,
    md5_long_sql,
    tokens,
    tokens_sql,
    word_ngrams,
    word_ngrams_sql,
)


def repeated_span_stats(
    docs: DataFrame,
    span_tokens: int = 8,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Per-doc duplicated-passage mask for ``span_tokens``-token windows.

    A window is *duplicated* if its L-gram occurs more than once in the
    corpus (across documents or within one); every occurrence except the
    globally-first (min ``(id, pos)``) is masked, so the canonical copy of
    a repeated passage survives intact. Returns one row per input doc:

    ``(id, n_tokens, n_dup_tokens, dup_frac, n_spans, clean_text)``

    where ``n_spans`` counts maximal merged masked intervals and
    ``clean_text`` is the token stream with masked positions removed
    (whitespace-normalized). Docs shorter than ``span_tokens`` pass
    through unmasked.

    The per-token membership test in ``clean_text`` is
    O(n_tokens * n_masked) per document — bounded by document length
    squared; chunk pathological multi-MB docs upstream
    (``chunk_documents``) as every pipeline here assumes.
    """
    L = int(span_tokens)
    base = _tokenized(docs, text_col, id_col)
    grams = _grams(base, L)
    gstats = (
        grams.groupBy("ghash")
        .agg(F.count("*").alias("cnt"), F.min(F.struct("id", "pos")).alias("keeper"))
        .filter(F.col("cnt") > 1)
        .select("ghash", "keeper")
    )
    masked = grams.join(gstats, "ghash").filter(
        ~((F.col("id") == F.col("keeper.id")) & (F.col("pos") == F.col("keeper.pos")))
    )
    return _mask_to_stats(base, masked, L)


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))


def _grams(base: DataFrame, L: int) -> DataFrame:
    return base.select(
        "id", F.posexplode(word_ngrams(F.col("toks"), L)).alias("pos0", "gram")
    ).select("id", (F.col("pos0") + 1).alias("pos"), md5_long(F.col("gram")).alias("ghash"))


def _mask_to_stats(base: DataFrame, masked: DataFrame, L: int) -> DataFrame:
    """Fold masked (id, pos) occurrences into the per-doc output rows
    (shared by the batch and incremental forms)."""
    starts_by_id = masked.groupBy("id").agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )
    joined = base.join(starts_by_id, "id", "left").select(
        "id",
        "toks",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias("starts"),
    )
    covered = F.sort_array(
        F.array_distinct(
            F.flatten(
                F.transform(F.col("starts"), lambda s: F.sequence(s, s + F.lit(L - 1)))
            )
        )
    )
    joined = joined.withColumn("covered", covered)
    # a new maximal interval starts at starts[i] iff the gap to the
    # previous start exceeds L (sorted starts; touching windows merge)
    new_span = F.filter(
        F.col("starts"),
        lambda s, i: F.when(i == F.lit(0), F.lit(True)).otherwise(
            (s - F.element_at(F.col("starts"), i)) > F.lit(L)
        ),
    )
    n = F.size(F.col("toks"))
    return joined.select(
        "id",
        n.cast("long").alias("n_tokens"),
        F.size(F.col("covered")).cast("long").alias("n_dup_tokens"),
        (
            F.round(
                F.when(n > 0, F.size(F.col("covered")) / n).otherwise(F.lit(0.0)), 6
            )
            + F.lit(0.0)
        ).alias("dup_frac"),
        F.size(new_span).cast("long").alias("n_spans"),
        F.concat_ws(
            " ",
            F.filter(
                F.col("toks"),
                lambda t, i: ~F.array_contains(F.col("covered"), (i + 1).cast("int")),
            ),
        ).alias("clean_text"),
    )


def repeated_span_stats_sql(
    docs_sql: str,
    span_tokens: int = 8,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """DuckDB twin of :func:`repeated_span_stats` (same values; the oracle
    uses a row_number window where Spark uses groupBy + min(struct) — the
    masked set is identical). DuckDB lambda indexes are 1-based where
    Spark's are 0-based; both sides mask 1-based token positions."""
    L = int(span_tokens)
    toks = tokens_sql(f'"{text_col}"')
    grams = word_ngrams_sql("toks", L)
    return f"""
WITH __t AS (
  SELECT "{id_col}" AS id, {toks} AS toks FROM ({docs_sql})
),
__g AS (
  SELECT id, pos, {md5_long_sql('grams[pos]')} AS ghash FROM (
    SELECT id, grams, unnest(range(1, len(grams) + 1)) AS pos
    FROM (SELECT id, {grams} AS grams FROM __t)
  )
),
__w AS (
  SELECT id, pos,
         row_number() OVER (PARTITION BY ghash ORDER BY id, pos) AS rn,
         count(*) OVER (PARTITION BY ghash) AS cnt
  FROM __g
),
__s AS (
  SELECT id, list_sort(list(pos)) AS starts
  FROM __w WHERE cnt > 1 AND rn > 1 GROUP BY id
),
__d AS (
  SELECT t.id, t.toks, coalesce(s.starts, []) AS starts
  FROM __t t LEFT JOIN __s s ON t.id = s.id
),
__c AS (
  SELECT id, toks, starts,
         list_sort(list_distinct(flatten(
           list_transform(starts, s -> range(s, s + {L}))))) AS covered
  FROM __d
)
SELECT id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(covered) AS BIGINT) AS n_dup_tokens,
       (round(CASE WHEN len(toks) > 0
                   THEN CAST(len(covered) AS DOUBLE) / len(toks)
                   ELSE 0.0 END, 6) + 0.0) AS dup_frac,
       CAST(len(list_filter(starts,
            (s, i) -> i = 1 OR s - starts[i - 1] > {L})) AS BIGINT) AS n_spans,
       coalesce(array_to_string(list_filter(toks,
            (t, i) -> NOT list_contains(covered, i)), ' '), '') AS clean_text
FROM __c"""


def write_span_index(
    docs: DataFrame,
    path: str,
    span_tokens: int = 8,
    n_buckets: int = 256,
    text_col: str = "document",
    id_col: str = "id",
) -> dict:
    """Persist the corpus's DISTINCT L-gram hash set partitioned by
    ``bucket = ghash % n_buckets`` — the incremental span-dedup index.

    This is all the incremental pass needs (arrival-order semantics: a
    batch occurrence of any gram the corpus has EVER seen is masked —
    existence, not counts or keepers), so the index is one narrow BIGINT
    column, distinct-gram-sized, far smaller than the gram stream.
    Returns the params dict later batches must reuse."""
    g = _grams(_tokenized(docs, text_col, id_col), int(span_tokens))
    (
        g.select("ghash")
        .distinct()
        .withColumn("bucket", (F.col("ghash") % n_buckets).cast("int"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return {"span_tokens": int(span_tokens), "n_buckets": int(n_buckets)}


def append_span_index(
    docs: DataFrame,
    path: str,
    params: dict,
    text_col: str = "document",
    id_col: str = "id",
) -> None:
    """O(batch) maintenance: append the batch's NOT-yet-indexed distinct
    gram hashes into their bucket partitions (anti-join against the
    existing index, write mode append — untouched buckets' files are never
    rewritten, the same O(changed)-writes discipline as the dedup band
    index)."""
    spark = docs.sparkSession
    existing = spark.read.parquet(path)
    g = (
        _grams(_tokenized(docs, text_col, id_col), int(params["span_tokens"]))
        .select("ghash")
        .distinct()
        .withColumn("bucket", (F.col("ghash") % int(params["n_buckets"])).cast("int"))
    )
    fresh = g.join(existing, ["ghash"], "anti")
    fresh.repartition("bucket").write.mode("append").partitionBy("bucket").parquet(path)


def incremental_span_stats(
    new_docs: DataFrame,
    corpus_grams: DataFrame,
    span_tokens: int = 8,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Span dedup for a NEW batch against a persisted corpus gram index:
    a batch occurrence is masked iff its gram exists in the corpus
    (arrival order — the corpus copy came first) OR an earlier batch
    occurrence keeps it (the within-batch keep-first of
    :func:`repeated_span_stats`). Output schema identical to the batch
    form, one row per batch doc.

    Steady-state cost is O(batch): batch grams are batch-sized, the
    corpus index join is an equi-join on the hash (the index side prunes
    to the batch's bucket partitions upstream when the caller filters
    ``corpus_grams`` by bucket; the index is distinct-gram-sized either
    way, never the corpus text), and the corpus is re-shingled zero
    times.

    EQUALS the full-corpus recompute restricted to the batch whenever
    corpus ids order before batch ids (then global min-(id, pos) keepers
    coincide with arrival order) — which is exactly how the oracle twin
    is phrased."""
    L = int(span_tokens)
    base = _tokenized(new_docs, text_col, id_col)
    grams = _grams(base, L)
    # within-batch duplicate keepers (batch-sized aggregation)
    gstats = (
        grams.groupBy("ghash")
        .agg(F.count("*").alias("cnt"), F.min(F.struct("id", "pos")).alias("keeper"))
    )
    in_corpus = corpus_grams.select("ghash").distinct()
    enriched = grams.join(gstats, "ghash").join(
        in_corpus.withColumn("__hit", F.lit(True)), ["ghash"], "left"
    )
    masked = enriched.filter(
        F.col("__hit").isNotNull()
        | (
            (F.col("cnt") > 1)
            & ~(
                (F.col("id") == F.col("keeper.id"))
                & (F.col("pos") == F.col("keeper.pos"))
            )
        )
    )
    return _mask_to_stats(base, masked, L)


def incremental_span_stats_sql(
    docs_sql: str,
    batch_pred: str,
    span_tokens: int = 8,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """Oracle twin: the full-corpus :func:`repeated_span_stats_sql` over
    ALL docs, restricted to the batch rows (``batch_pred`` over ``id``).
    Valid because the registry fixture orders corpus ids before batch ids
    (see :func:`incremental_span_stats`)."""
    full = repeated_span_stats_sql(docs_sql, span_tokens, text_col, id_col)
    return f"SELECT * FROM ({full}) WHERE {batch_pred}"


def corpus_gram_hashes(
    docs: DataFrame,
    span_tokens: int = 8,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """The distinct L-gram hash set of a corpus (the in-plan form of what
    :func:`write_span_index` persists) — feed to
    :func:`incremental_span_stats` as ``corpus_grams``."""
    return (
        _grams(_tokenized(docs, text_col, id_col), int(span_tokens))
        .select("ghash")
        .distinct()
    )
