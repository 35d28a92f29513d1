"""Winners-only hydration + exact re-rank shared by the quantized tiers.

The code-domain prefilters (Hamming / SQ4-ADC / PQ-LUT) can produce tens of
millions of candidate rows per query batch. If each candidate row carries
its full float vector (and the query's), the prefilter's top-k shuffle
moves *wide* rows — measured at SIFT1M scale this spilled a 26M-candidate
sign-bit sweep to disk until the volume ran out of space. The fix is the
same winners-only-hydration rule the projection operator already follows
(`operators/search.py`, reference `KnnProjection`): the prefilter emits
ONLY ``(query_id, id, metric)``; full vectors are fetched afterwards for
the ``rerank_factor * k`` survivors via broadcast joins.

At 100 TB this is also the right byte economics: the candidate scan reads
only the narrow code column; the wide embedding column is read in a second,
semi-join-pruned pass over just the probed partitions, and only survivor
rows travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import distance
from ..operators.topk import topk_per_group


def hydrate_rerank(
    survivors: DataFrame,
    source: DataFrame,
    queries: DataFrame,
    k: int,
    space: str,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    round_decimals: int | None,
) -> DataFrame:
    """``survivors``: narrow ``(__qid, id)`` prefilter winners (bounded by
    ``queries x rerank_factor x k`` — broadcastable by construction).
    ``source``: the records/postings table to fetch vectors from (may hold
    replica duplicates per id). ``queries``: ``(__qid, __qvec)``.

    Returns ``(query_id, id, dist, rank)`` — exact distances, ascending,
    ties by id."""
    ids = survivors.select(id_col).distinct()
    vecs = (
        source.join(F.broadcast(ids), id_col, "semi")
        .select(id_col, vec_col)
        .dropDuplicates([id_col])  # replicas carry identical vectors
    )
    hydrated = (
        survivors.join(F.broadcast(vecs), id_col)
        .join(F.broadcast(queries), "__qid")
    )
    d = distance(F.col(vec_col), F.col("__qvec"), space)
    if round_decimals is not None:
        d = F.round(d, round_decimals) + F.lit(0.0)
    return topk_per_group(
        hydrated.select(F.col("__qid").alias(query_id_col), F.col(id_col), d.alias("dist")),
        [query_id_col],
        [F.col("dist").asc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )
