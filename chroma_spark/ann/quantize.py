"""Binary quantization + re-rank — the quantized-SPANN analog.

Reference: RaBitQ 1-bit codes with corrective factors + brute-force re-rank
(`rust/index/src/quantization/mod.rs:1-40`, operators
`quantized_spann_*.rs`): a cheap code-domain prefilter shrinks the
candidate set, then exact float distances re-rank the survivors.

Spark re-expression (public RaBitQ idea, simplified to its sign-bit core):

- **codes**: per-dimension global mean (one tiny aggregate) -> each vector
  becomes ``ceil(dim/64)`` packed BIGINT words, bit j of word w =
  ``vec[64w+j] > mean[64w+j]``. Pure column math (`aggregate`/`transform`/
  bit ops) — whole-stage codegen, no UDF, ~dim/8 bytes per row instead of
  4·dim.
- **search**: Hamming distance (xor + bit_count over the packed words)
  ranks all rows per query — a popcount scan is ~32× cheaper than float
  l2 — keep ``rerank_factor·k`` candidates, then exact re-rank only those.
  Sign-bit-only codes (no RaBitQ corrective factors) are lossy: measured on
  the 64-d testdata, recall@10 is 0.8 / 0.93 / 1.0 at rerank_factor
  8 / 16 / 24 — size rerank_factor accordingly (still ≪ corpus at scale).
- at 100 TB the packed-code column is a separate narrow table (or the same
  table's column with Parquet column pruning), so the prefilter scan reads
  ~3% of the bytes of a full-vector scan; the re-rank joins back to fetch
  full vectors for only ``rerank_factor·k`` rows per query.

Composes with IVF (ann/ivf.py): probe lists first, Hamming-prune within
the probed posting lists, re-rank last — exactly the reference's
quantized-SPANN pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import distance
from ..operators.topk import topk_per_group

WORD = 64


def dim_means(records: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension mean (the quantization pivot). One aggregate over a
    posexploded scan — build-time only, output is dim floats."""
    row = (
        records.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.avg("x").alias("m"))
        .orderBy("d")
        .collect()
    )
    return [r["m"] for r in row]


def _pack_expr(vec_col: str, means: list[float]) -> F.Column:
    """Packed sign-bit words: array<long>, bit j of word w set iff
    ``vec[w*64+j] > means[w*64+j]``. Built-in expressions only."""
    dim = len(means)
    n_words = (dim + WORD - 1) // WORD
    words = []
    for w in range(n_words):
        bits = [
            F.when(
                F.element_at(F.col(vec_col), w * WORD + j + 1) > F.lit(means[w * WORD + j]),
                # bit 63 is the sign bit: use its signed-long value
                F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(min(WORD, dim - w * WORD))
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc.bitwiseOR(b)
        words.append(acc)
    return F.array(*words)


def build_codes(
    records: DataFrame,
    means: list[float] | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Returns ``(records + code ARRAY<BIGINT>, means)``. Pass the training
    ``means`` back in to encode queries identically."""
    if means is None:
        means = dim_means(records, vec_col)
    return records.withColumn("code", _pack_expr(vec_col, means)), means


def hamming(code_a: F.Column, code_b: F.Column) -> F.Column:
    """Popcount of xor over packed words (BIGINT)."""
    return F.aggregate(
        F.zip_with(code_a, code_b, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


# ---------------------------------------------------------------------------
# 4-bit scalar quantization (SQ4) — the second quantization tier.
#
# The reference ships RaBitQ 1-bit AND 4-bit codes with correction terms
# (rust/index/src/quantization/mod.rs:1-40). The public 4-bit analog is
# scalar quantization with asymmetric distance (FAISS SQ4 / the
# reconstruction half of IVF-PQ): per-dimension (lo, step) corrective
# metadata, codes = 16 levels per dim packed 16-per-BIGINT, and the
# prefilter scores the FULL-precision query against the reconstructed
# candidate (ADC) — far tighter than Hamming, so the exact re-rank needs a
# much smaller rerank_factor (recall ≥ 0.95 at ×4 vs ×24 for sign bits; the
# compute trade is the standard SQ one — the scan still reads ~1/8 the
# bytes of full vectors, but the prefilter does float math).
# ---------------------------------------------------------------------------

SQ4_PER_WORD = 16  # 4 bits/dim -> 16 dims per 64-bit word


def dim_ranges(records: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (lo, step) with step sized so max maps to level 15 —
    the corrective metadata; one aggregate over a posexploded scan."""
    rows = (
        records.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("d")
        .collect()
    )
    lo = [float(r["lo"]) for r in rows]
    step = [max((float(r["hi"]) - float(r["lo"])) / 15.0, 1e-12) for r in rows]
    return lo, step


def _code4(vec_col: str, d: int, lo: list[float], step: list[float]) -> F.Column:
    """Level 0..15 for dimension d: floor((x-lo)/step + 0.5), clamped —
    floor(+0.5) rather than round() so every engine breaks .5 identically."""
    x = F.element_at(F.col(vec_col), d + 1)
    lvl = F.floor((x - F.lit(lo[d])) / F.lit(step[d]) + F.lit(0.5)).cast("int")
    return F.least(F.lit(15), F.greatest(F.lit(0), lvl))


def _pack4_expr(vec_col: str, lo: list[float], step: list[float]) -> F.Column:
    dim = len(lo)
    n_words = (dim + SQ4_PER_WORD - 1) // SQ4_PER_WORD
    words = []
    for w in range(n_words):
        acc = None
        for j in range(min(SQ4_PER_WORD, dim - w * SQ4_PER_WORD)):
            piece = F.shiftleft(_code4(vec_col, w * SQ4_PER_WORD + j, lo, step).cast("long"), 4 * j)
            acc = piece if acc is None else acc.bitwiseOR(piece)
        words.append(acc)
    return F.array(*words)


def _unpack4_expr(code_col: str, lo: list[float], step: list[float]) -> F.Column:
    """Reconstructed vector (array<double>) from packed words: lo + lvl*step.
    Extraction uses unsigned shifts — level 15 in the top nibble sets the
    sign bit of its word."""
    recon = []
    for d in range(len(lo)):
        w, j = d // SQ4_PER_WORD, d % SQ4_PER_WORD
        lvl = F.shiftrightunsigned(F.element_at(F.col(code_col), w + 1), 4 * j).bitwiseAND(F.lit(15))
        recon.append(F.lit(lo[d]) + lvl.cast("double") * F.lit(step[d]))
    return F.array(*recon)


def build_codes4(
    records: DataFrame,
    ranges: tuple[list[float], list[float]] | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, tuple[list[float], list[float]]]:
    """Returns ``(records + code4 ARRAY<BIGINT>, (lo, step))``. Pass the
    trained ``ranges`` back in to encode deltas/queries identically."""
    if ranges is None:
        ranges = dim_ranges(records, vec_col)
    lo, step = ranges
    return records.withColumn("code4", _pack4_expr(vec_col, lo, step)), ranges


def sq4_search(
    coded_records: DataFrame,
    queries: DataFrame,
    ranges: tuple[list[float], list[float]],
    k: int,
    rerank_factor: int = 4,
    space: str = "l2",
    id_col: str = "id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """ADC prefilter (full-precision query vs reconstructed candidates,
    top ``rerank_factor*k``) -> exact re-rank top-k. Output
    ``(query_id, id, dist, rank)``, drop-in interchangeable with the other
    KNN operators. ADC distances round like exact ones so ties are stable."""
    from .rerank import hydrate_rerank

    lo, step = ranges
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qvec")
    )
    adc = distance(_unpack4_expr("code4", lo, step), F.col("__qvec"), space)
    if round_decimals is not None:
        adc = F.round(adc, round_decimals) + F.lit(0.0)
    # prefilter emits ONLY (qid, id, adc): the top-k shuffle stays narrow
    # even with millions of candidates (see rerank.py)
    survivors = topk_per_group(
        coded_records.crossJoin(F.broadcast(q)).select(
            "__qid", F.col(id_col), adc.alias("__adc")
        ),
        ["__qid"],
        [F.col("__adc").asc(), F.col(id_col).asc()],
        rerank_factor * k,
    ).select("__qid", id_col)
    return hydrate_rerank(
        survivors, coded_records, q, k, space, id_col, vec_col, query_id_col, round_decimals
    )


def ivf_sq4_search(
    centroids: DataFrame,
    coded_postings: DataFrame,
    queries: DataFrame,
    ranges: tuple[list[float], list[float]],
    k: int,
    nprobe: int,
    rerank_factor: int = 4,
    space: str = "l2",
    id_col: str = "id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_decimals: int | None = 6,
    allowed_ids: DataFrame | None = None,
    excluded_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF + SQ4: nprobe centroid pruning -> ADC prefilter within probed
    lists -> exact re-rank; the probed scan reads the narrow code column."""
    lo, step = ranges
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qvec")
    )
    cdist = distance(F.col("centroid"), F.col("__qvec"), "l2")
    probes = topk_per_group(
        q.crossJoin(F.broadcast(centroids)).select(
            "__qid", "__qvec", "centroid_id", cdist.alias("__cdist")
        ),
        ["__qid"],
        [F.col("__cdist").asc(), F.col("centroid_id").asc()],
        nprobe,
        two_stage=False,
    ).select("__qid", "__qvec", "centroid_id")
    probed_src = coded_postings
    if allowed_ids is not None:
        probed_src = probed_src.join(allowed_ids.select(F.col(id_col)), id_col, "semi")
    if excluded_ids is not None:
        probed_src = probed_src.join(excluded_ids.select(F.col(id_col)), id_col, "anti")
    from .rerank import hydrate_rerank

    adc = distance(_unpack4_expr("code4", lo, step), F.col("__qvec"), space)
    if round_decimals is not None:
        adc = F.round(adc, round_decimals) + F.lit(0.0)
    # narrow prefilter: (qid, id, adc) only; replicas collapse via min
    survivors = topk_per_group(
        probed_src.join(F.broadcast(probes), "centroid_id")
        .select("__qid", F.col(id_col), adc.alias("__adc"))
        .groupBy("__qid", id_col)
        .agg(F.min("__adc").alias("__adc")),
        ["__qid"],
        [F.col("__adc").asc(), F.col(id_col).asc()],
        rerank_factor * k,
    ).select("__qid", id_col)
    # hydration scan stays partition-pruned to the probed lists
    hyd_src = probed_src.join(
        F.broadcast(probes.select("centroid_id").distinct()), "centroid_id"
    )
    return hydrate_rerank(
        survivors, hyd_src, q, k, space, id_col, vec_col, query_id_col, round_decimals
    )


def quantized_search(
    coded_records: DataFrame,
    queries: DataFrame,
    means: list[float],
    k: int,
    rerank_factor: int = 8,
    space: str = "l2",
    id_col: str = "id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Hamming prefilter (top ``rerank_factor*k``) -> exact re-rank top-k.

    Output ``(query_id, id, dist, rank)`` — drop-in interchangeable with
    exact_knn / ivf_search, recall-tested the same way.
    """
    from .rerank import hydrate_rerank

    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qvec"),
        _pack_expr(query_vec_col, means).alias("__qcode"),
    )
    ham = hamming(F.col("code"), F.col("__qcode"))
    # narrow prefilter: (qid, id, ham) only (see rerank.py)
    survivors = topk_per_group(
        coded_records.crossJoin(F.broadcast(q.select("__qid", "__qcode"))).select(
            "__qid", F.col(id_col), ham.alias("__ham")
        ),
        ["__qid"],
        [F.col("__ham").asc(), F.col(id_col).asc()],
        rerank_factor * k,
    ).select("__qid", id_col)
    return hydrate_rerank(
        survivors,
        coded_records,
        q.select("__qid", "__qvec"),
        k,
        space,
        id_col,
        vec_col,
        query_id_col,
        round_decimals,
    )


def ivf_quantized_search(
    centroids: DataFrame,
    coded_postings: DataFrame,
    queries: DataFrame,
    means: list[float],
    k: int,
    nprobe: int,
    rerank_factor: int = 8,
    space: str = "l2",
    id_col: str = "id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_decimals: int | None = 6,
    allowed_ids: DataFrame | None = None,
    excluded_ids: DataFrame | None = None,
) -> DataFrame:
    """Full quantized-SPANN pipeline: nprobe centroid pruning -> Hamming
    prefilter within the probed lists -> exact re-rank. The candidate scan
    reads only probed partitions AND only the narrow code column.
    ``allowed_ids``/``excluded_ids``: see ivf.ivf_search (filter-before-ANN
    and WAL-tail staleness exclusion)."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qvec"),
        _pack_expr(query_vec_col, means).alias("__qcode"),
    )
    cdist = distance(F.col("centroid"), F.col("__qvec"), "l2")
    probes = topk_per_group(
        q.crossJoin(F.broadcast(centroids)).select(
            "__qid", "__qvec", "__qcode", "centroid_id", cdist.alias("__cdist")
        ),
        ["__qid"],
        [F.col("__cdist").asc(), F.col("centroid_id").asc()],
        nprobe,
        two_stage=False,
    ).select("__qid", "__qvec", "__qcode", "centroid_id")
    probed_src = coded_postings
    if allowed_ids is not None:
        probed_src = probed_src.join(allowed_ids.select(F.col(id_col)), id_col, "semi")
    if excluded_ids is not None:
        probed_src = probed_src.join(excluded_ids.select(F.col(id_col)), id_col, "anti")
    from .rerank import hydrate_rerank

    ham = hamming(F.col("code"), F.col("__qcode"))
    # narrow prefilter: (qid, id, ham); replicas collapse via min
    survivors = topk_per_group(
        probed_src.join(F.broadcast(probes.drop("__qvec")), "centroid_id")
        .select("__qid", F.col(id_col), ham.alias("__ham"))
        .groupBy("__qid", id_col)
        .agg(F.min("__ham").alias("__ham")),
        ["__qid"],
        [F.col("__ham").asc(), F.col(id_col).asc()],
        rerank_factor * k,
    ).select("__qid", id_col)
    hyd_src = probed_src.join(
        F.broadcast(probes.select("centroid_id").distinct()), "centroid_id"
    )
    return hydrate_rerank(
        survivors,
        hyd_src,
        q.select("__qid", "__qvec"),
        k,
        space,
        id_col,
        vec_col,
        query_id_col,
        round_decimals,
    )
