"""Deterministic stratified sampling — reproducible dataset mixing.

A training-data pipeline mixes sources at configured rates ("50% of src A,
10% of everything else"). ``DataFrame.sample``/``sampleBy`` are
seed-dependent on partitioning and irreproducible across engines; the
standard reproducible trick is HASH sampling: keep a row iff
``md5(salt || id) % M < rate * M``. The decision is a pure function of the
row's id — stable across runs, engines, cluster sizes, and incremental
re-runs (a row's membership never flips when other rows arrive), and the
same row set falls out of the DuckDB oracle.

One scan, no shuffle, no state. Rates are exact in expectation with md5
uniformity; at 100 TB the per-group counts concentrate tightly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql, sql_lit, tokens, word_ngrams

_M = 1_000_000  # rate resolution: 1e-6


def _keep_expr(id_col: str, rate: Column, salt: str) -> Column:
    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % _M
    # round, don't truncate: 0.6 * 1e6 is 599999.999... in binary floating
    # point — truncation would disagree with the SQL twin's decimal rounding
    return h < F.round(rate * _M).cast("long")


def hash_sample(
    df: DataFrame,
    rate: float | None = None,
    rates_by_group: dict[str, float] | None = None,
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (or per-group rates).

    ``rates_by_group`` maps group values to rates; unlisted groups get
    ``default_rate``. ``salt`` decorrelates independent samples drawn from
    the same corpus (two salts give independent subsets)."""
    if (rate is None) == (rates_by_group is None):
        raise ValueError("pass exactly one of rate / rates_by_group")
    if rate is not None:
        r: Column = F.lit(float(rate))
    else:
        r = F.lit(float(default_rate))
        for g, gr in sorted(rates_by_group.items()):
            r = F.when(F.col(group_col) == g, F.lit(float(gr))).otherwise(r)
    return df.filter(_keep_expr(id_col, r, salt))


def hash_sample_sql(
    src_sql: str,
    rate: float | None = None,
    rates_by_group: dict[str, float] | None = None,
    default_rate: float = 0.0,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> str:
    if (rate is None) == (rates_by_group is None):
        raise ValueError("pass exactly one of rate / rates_by_group")
    if rate is not None:
        r = repr(float(rate))
    else:
        r = repr(float(default_rate))
        for g, gr in sorted(rates_by_group.items()):
            r = f'CASE WHEN "{group_col}" = {sql_lit(g)} THEN {float(gr)!r} ELSE {r} END'
    h = md5_long_sql(f'{sql_lit(salt)} || CAST("{id_col}" AS VARCHAR)')
    return (
        f"SELECT * FROM ({src_sql}) "
        f"WHERE {h} % {_M} < CAST(round(CAST(({r}) AS DOUBLE) * {_M}) AS BIGINT)"
    )


def mix_to_proportions(
    df: DataFrame,
    proportions: dict[str, float],
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> DataFrame:
    """Resample listed groups to target mixing proportions, keeping the
    largest corpus the targets allow.

    ``proportions`` maps group value -> target weight (ratios matter, not
    the absolute scale). With per-group counts ``n_g``, the max total obeying
    the targets is ``T = min_g(n_g / w_g)`` (the binding group is kept
    whole); each group keeps a deterministic md5-hash sample at rate
    ``(T * w_g) / n_g``. Groups not listed are dropped.

    Per-group counts are a single partial-aggregated count over the scan —
    ``len(proportions)`` rows reach the driver (a config-sized, bounded
    collect), the rates become plan literals, and the big side is then one
    shuffle-free hash-filter scan (same shape as :func:`hash_sample`).
    Rates are computed as ``(T * w) / n`` on IEEE doubles in both engines,
    so the md5-threshold decision is bit-identical to the SQL twin."""
    if not proportions:
        raise ValueError("proportions must be non-empty")
    keys = sorted(proportions)
    counts = {
        r[group_col]: r["n"]
        for r in df.filter(F.col(group_col).isin(keys))
        .groupBy(group_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    present = [g for g in keys if counts.get(g)]
    if not present:
        return df.filter(F.lit(False))
    t = min(float(counts[g]) / float(proportions[g]) for g in present)
    rates = {g: (t * float(proportions[g])) / float(counts[g]) for g in present}
    return hash_sample(
        df,
        rates_by_group=rates,
        default_rate=0.0,
        group_col=group_col,
        id_col=id_col,
        salt=salt,
    )


def mix_to_proportions_sql(
    src_sql: str,
    proportions: dict[str, float],
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "",
) -> str:
    """Standalone SQL twin: derives counts, T, and per-group rates inside
    the query with the same double-precision expression order."""
    if not proportions:
        raise ValueError("proportions must be non-empty")
    weights = ", ".join(
        f"({sql_lit(g)}, {float(w)!r})" for g, w in sorted(proportions.items())
    )
    h = md5_long_sql(f'{sql_lit(salt)} || CAST("{id_col}" AS VARCHAR)')
    return f"""
WITH __w(g, w) AS (VALUES {weights}),
__n AS (
  SELECT "{group_col}" AS g, CAST(count(*) AS DOUBLE) AS n
  FROM ({src_sql}) WHERE "{group_col}" IN (SELECT g FROM __w)
  GROUP BY "{group_col}"
),
__t AS (SELECT min(__n.n / __w.w) AS t FROM __n JOIN __w ON __n.g = __w.g),
__r AS (
  SELECT __n.g, ((SELECT t FROM __t) * __w.w) / __n.n AS rate
  FROM __n JOIN __w ON __n.g = __w.g
)
SELECT s.* FROM ({src_sql}) s
JOIN __r ON s."{group_col}" = __r.g
WHERE {h} % {_M} < CAST(round(rate * {_M}) AS BIGINT)"""


def sample_cluster_balanced(
    vectors: DataFrame,
    centroids: DataFrame,
    cap: int,
    id_col: str = "id",
    vec_col: str = "embedding",
    salt: str = "balance",
    method: str = "expr",
) -> DataFrame:
    """Embedding-diversity sampling: at most ``cap`` rows per nearest
    centroid — the cluster-balanced subset selection a pre-training
    pipeline uses to de-bias a corpus toward its dense regions (cluster
    then cap, cf. the dedup-and-diversify recipe of SemDeDup and friends).

    Assignment is argmin rounded-l2 with centroid_id tiebreak (the same
    bit-determinism discipline as the fixed-centroid IVF oracle);
    within-cluster selection is the deterministic md5 order used by every
    sampler here (id tiebreak), so the subset is reproducible across
    engines, runs, and cluster layouts.

    Shape at scale: centroids broadcast (config-sized), the per-cluster
    cap is the two-stage skew-safe top-k (a hot cluster pre-truncates to
    ``cap`` per input partition before the final per-cluster window).
    ``method="expr"`` assigns via the rounded-l2 Catalyst crossJoin —
    oracle-parity, but O(N * n_lists * dim) interpreted array-lambda ops
    (measured: does NOT complete at 1M x 128-d x 1024 lists in 20 min).
    ``method="arrow"`` delegates to the ANN module's GEMM assignment
    (``ann.ivf._assign_arrow`` — ~100x, use for bulk runs; last-ulp ties
    may differ from the expr/oracle form). If the collection already has
    an IVF index, skip assignment entirely with
    :func:`sample_cluster_balanced_from_postings`. Returns
    ``(centroid_id, id, pick_rank)``.
    """
    from ..functions.distance import l2
    from .topk import topk_per_group

    if method == "arrow":
        from ..ann.ivf import _assign_arrow

        assigned = _assign_arrow(
            vectors.select(id_col, vec_col),
            centroids.select("centroid_id", "centroid"),
            1,
            id_col,
            vec_col,
        ).select(id_col, "centroid_id")
    else:
        d = F.round(l2(F.col(vec_col), F.col("centroid")), 6) + F.lit(0.0)
        assigned = topk_per_group(
            vectors.select(id_col, vec_col)
            .crossJoin(F.broadcast(centroids.select("centroid_id", "centroid")))
            .select(id_col, "centroid_id", d.alias("__d")),
            [id_col],
            [F.col("__d").asc(), F.col("centroid_id").asc()],
            1,
            two_stage=False,
        ).select(id_col, "centroid_id")
    pick = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return topk_per_group(
        assigned.withColumn("__h", pick),
        ["centroid_id"],
        [F.col("__h").asc(), F.col(id_col).asc()],
        int(cap),
        rank_col="pick_rank",
    ).select("centroid_id", F.col(id_col).alias("id"), "pick_rank")


def sample_cluster_balanced_sql(
    vectors_sql: str,
    centroids_sql: str,
    cap: int,
    id_col: str = "id",
    vec_col: str = "embedding",
    salt: str = "balance",
) -> str:
    """DuckDB twin: ``centroids_sql`` must yield (centroid_id, centroid)."""
    from ..functions.distance import l2_sql

    d = l2_sql(f'v."{vec_col}"', "c.centroid")
    # inside the CTE the id column is already aliased to `id`
    h = md5_long_sql(f"{sql_lit(salt)} || CAST(id AS VARCHAR)")
    return f"""
WITH __a AS (
  SELECT v."{id_col}" AS id, c.centroid_id, (round({d}, 6) + 0.0) AS dd
  FROM ({vectors_sql}) v CROSS JOIN ({centroids_sql}) c
),
__assigned AS (
  SELECT id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dd ASC, centroid_id ASC) AS rn
    FROM __a
  ) WHERE rn = 1
)
SELECT centroid_id, id, pick_rank FROM (
  SELECT centroid_id, id,
         row_number() OVER (PARTITION BY centroid_id ORDER BY {h} ASC, id ASC) AS pick_rank
  FROM __assigned
) WHERE pick_rank <= {int(cap)}"""


def sample_cluster_balanced_from_postings(
    postings: DataFrame,
    cap: int,
    id_col: str = "id",
    cluster_col: str = "centroid_id",
    salt: str = "balance",
) -> DataFrame:
    """Cluster-balanced sampling served from a PERSISTED assignment — the
    IVF index's posting lists already store (centroid_id, id), so when the
    collection has a built vector index the cap-per-cluster subset costs
    ZERO distance computations: one projection of the narrow posting
    table + the two-stage per-cluster top-k. This is the 100-TB path;
    :func:`sample_cluster_balanced` (argmin assignment in-plan) is for
    corpora without an index. Same deterministic md5-order selection, so
    both paths pick the same rows for the same assignment."""
    from .topk import topk_per_group

    pick = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return topk_per_group(
        postings.select(F.col(cluster_col).alias("centroid_id"), F.col(id_col).alias("id"))
        .withColumn("__h", pick),
        ["centroid_id"],
        [F.col("__h").asc(), F.col("id").asc()],
        int(cap),
        rank_col="pick_rank",
    ).select("centroid_id", "id", "pick_rank")


def dsir_importance(
    docs: DataFrame,
    target,
    n_buckets: int = 1024,
    add_k: float = 1.0,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): hash each document's
    word unigram+bigram features into ``n_buckets`` buckets, fit smoothed
    categorical distributions over buckets for the TARGET slice (rows
    matching the ``target`` boolean Column — the domain you want more of)
    and the RAW slice (everything else — the pool being sampled), and
    score every raw document by its log-likelihood ratio
    ``sum_f log(p_target(bucket(f)) / p_raw(bucket(f)))``. Sampling the
    raw pool proportionally to these weights (e.g. top-k, or Gumbel-top-k
    for a stochastic draw) reshapes it toward the target domain.

    Returns ``(id, n_feats, weight)`` for RAW rows only (the candidates);
    featureless docs get ``n_feats = 0, weight = NULL``.

    Scale shape: the fitted model is ONE ``n_buckets``-row table (config
    -sized — broadcast), built by a single explode → groupBy(bucket) pass
    with map-side combine; totals enter as a 1-row broadcast cross join.
    Per-doc features aggregate to (id, bucket, occ) BEFORE the join, so
    the broadcast join carries at most ``n_buckets`` rows per doc. No
    driver collect anywhere — at 100 TB this is two corpus scans (fit +
    score) and one tiny broadcast.
    """
    toks = tokens(F.col(text_col))
    feats = F.concat(toks, word_ngrams(toks, 2))
    k = F.lit(float(add_k))
    b = F.lit(int(n_buckets))

    tagged = docs.select(
        F.col(id_col).alias("id"), F.explode(feats).alias("feat"), target.alias("__t")
    ).withColumn("bucket", F.pmod(md5_long(F.col("feat")), b))
    counts = tagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("double").alias("c_t"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1)).cast("double").alias("c_r"),
    )
    totals = counts.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    ratio = F.log((F.col("c_t") + k) / (F.col("n_t") + k * b.cast("double"))) - F.log(
        (F.col("c_r") + k) / (F.col("n_r") + k * b.cast("double"))
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "bucket", ratio.alias("log_ratio")
    )

    raw = docs.filter(~target)
    doc_feats = (
        raw.select(F.col(id_col).alias("id"), F.explode(feats).alias("feat"))
        .withColumn("bucket", F.pmod(md5_long(F.col("feat")), b))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("occ"))
    )
    scored = (
        doc_feats.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(
            F.sum("occ").cast("bigint").alias("n_feats"),
            F.sum(F.col("occ").cast("double") * F.col("log_ratio")).alias("_w"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias("n_feats"),
            (F.round(F.col("_w"), 6) + F.lit(0.0)).alias("weight"),
        )
    )


def dsir_importance_sql(
    docs_sql: str,
    target_sql: str,
    n_buckets: int = 1024,
    add_k: float = 1.0,
    text_col: str = "document",
    id_col: str = "id",
) -> str:
    """DuckDB twin of :func:`dsir_importance`; ``target_sql`` is a boolean
    SQL expression over the ``docs_sql`` columns."""
    from ..functions.text import tokens_sql, word_ngrams_sql

    toks = tokens_sql(f'"{text_col}"')
    grams = word_ngrams_sql("t", 2)
    k = repr(float(add_k))
    b = int(n_buckets)
    return f"""
WITH base AS (
  SELECT "{id_col}" AS id, {toks} AS t, ({target_sql}) AS is_t FROM ({docs_sql})
),
feats AS (
  SELECT id, is_t, {md5_long_sql('feat')} % {b} AS bucket
  FROM (SELECT id, is_t, unnest(list_concat(t, {grams})) AS feat FROM base)
),
counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS DOUBLE) AS c_t,
         CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS DOUBLE) AS c_r
  FROM feats GROUP BY 1
),
totals AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r FROM counts),
model AS (
  SELECT bucket,
         ln((c_t + {k}) / (n_t + {k} * {b})) - ln((c_r + {k}) / (n_r + {k} * {b})) AS log_ratio
  FROM counts CROSS JOIN totals
),
doc_feats AS (
  SELECT id, bucket, count(*) AS occ FROM feats WHERE NOT is_t GROUP BY 1, 2
),
scored AS (
  SELECT id, CAST(sum(occ) AS BIGINT) AS n_feats,
         sum(CAST(occ AS DOUBLE) * log_ratio) AS w
  FROM doc_feats JOIN model USING (bucket) GROUP BY 1
)
SELECT d.id,
       CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       (round(s.w, 6) + 0.0) AS weight
FROM (SELECT id FROM base WHERE NOT is_t) d
LEFT JOIN scored s ON d.id = s.id"""


def gumbel_topk_sample(
    df: DataFrame,
    k: int,
    log_weight_col: str = "weight",
    id_col: str = "id",
    salt: str = "gumbel",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick: draw ``g_i ~ Gumbel(0,1)`` per row and take the
    top ``k`` by ``log_weight + g`` — an exact sample proportional to
    ``exp(log_weight)`` (Vieira 2014; the standard way to turn DSIR-style
    log-likelihood-ratio weights into an actual resampled subset). The
    "noise" is the md5 hash of (salt, id), so the draw is reproducible
    across engines, runs, and cluster layouts — same discipline as
    :func:`hash_sample`. Rows with NULL log-weight (e.g. featureless docs)
    are excluded. Returns ``(id, <log_weight_col>, sample_rank)``.

    Scale shape: one projection + ungrouped top-k, which compiles to
    TakeOrderedAndProject (per-partition heaps, driver merges k rows) —
    no global sort, no single-partition window.
    """
    from .topk import topk_per_group

    u = (md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % _M + 0.5) / _M
    key = F.round(F.col(log_weight_col) + (-F.log(-F.log(u))), 6) + F.lit(0.0)
    picked = topk_per_group(
        df.filter(F.col(log_weight_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(log_weight_col), key.alias("__g")),
        [],
        [F.col("__g").desc(), F.col("id").asc()],
        int(k),
        two_stage=False,
        rank_col="sample_rank",
    )
    return picked.select("id", log_weight_col, "sample_rank")


def gumbel_topk_sample_sql(
    src_sql: str,
    k: int,
    log_weight_col: str = "weight",
    id_col: str = "id",
    salt: str = "gumbel",
) -> str:
    """DuckDB twin of :func:`gumbel_topk_sample` over ``src_sql`` rows."""
    h = md5_long_sql(f"({sql_lit(salt)} || CAST(\"{id_col}\" AS VARCHAR))")
    key = (
        f'round("{log_weight_col}" + (-ln(-ln((({h}) % {_M} + 0.5) / {_M}))), 6) + 0.0'
    )
    return f"""
SELECT id, "{log_weight_col}",
       CAST(row_number() OVER (ORDER BY __g DESC, id ASC) AS BIGINT) AS sample_rank
FROM (
  SELECT "{id_col}" AS id, "{log_weight_col}", {key} AS __g
  FROM ({src_sql})
  WHERE "{log_weight_col}" IS NOT NULL
)
ORDER BY __g DESC, id ASC
LIMIT {int(k)}"""


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "cap",
) -> DataFrame:
    """Frequency cap: keep at most ``cap`` rows per group, chosen by a
    deterministic md5 order (the RefinedWeb / Dolma per-domain cap — a
    handful of giant domains would otherwise dominate the training mix;
    Penedo et al. 2023 §3.4 applies exactly this shape to URLs).

    Unlike :func:`hash_sample` (a RATE per group) this is a hard COUNT per
    group, so it needs a per-group top-k rather than a stateless filter.
    The selection order is ``md5(salt || id)`` — reproducible across
    engines/runs/layouts, and stable under re-partitioning. Returns the
    input columns unchanged for the surviving rows.

    Scale shape: two-stage top-k (:func:`~chroma_spark.operators.topk.
    topk_per_group`) — the 100-TB skew case IS the motivating case here (a
    single domain with billions of pages), and stage 1 cuts every
    (group, input-partition) to ``cap`` rows before the per-group shuffle.
    """
    from .topk import topk_per_group

    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    capped = topk_per_group(
        df.withColumn("__h", h),
        [group_col],
        [F.col("__h").asc(), F.col(id_col).asc()],
        int(cap),
    )
    return capped.drop("__h")


def cap_per_group_sql(
    src_sql: str,
    cap: int,
    group_col: str = "source",
    id_col: str = "id",
    salt: str = "cap",
) -> str:
    """DuckDB twin of :func:`cap_per_group` (QUALIFY row_number form)."""
    h = md5_long_sql(f"({sql_lit(salt)} || CAST(\"{id_col}\" AS VARCHAR))")
    return f"""
SELECT * EXCLUDE (__h) FROM (
  SELECT *, {h} AS __h FROM ({src_sql})
)
QUALIFY row_number() OVER (PARTITION BY "{group_col}" ORDER BY __h ASC, "{id_col}" ASC)
        <= {int(cap)}"""
