"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's own surface (SURVEY §7 phase 7): the operators a
100-TB text corpus needs before training — exact hash dedup, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup. Each has a
DuckDB SQL twin for the oracle gate.

Scale design notes:
- exact dedup: one hash-keyed aggregation — the canonical map-side-combine
  groupBy; no skew unless one document dominates (then AQE skew split).
- minhash LSH: signatures are per-row column math (md5-based, engine
  portable); candidate generation is a self-join on (band, band_hash) —
  the shuffle key is the band bucket, which is uniformly distributed by
  construction. Verification joins only candidate pairs.
- simhash: per-row 32-bit signature, then pair generation; at scale pairs
  come from banding the signature bits (prefix buckets), not the full cross
  join used for small-corpus verification.
- embedding near-dup: brute-force pair scan here; the scale path is the IVF
  index (ann/) restricting pairs to same-centroid buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql, tokens, tokens_sql, word_ngrams, word_ngrams_sql

# ---------------------------------------------------------------------------
# Exact (hash) dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(
    docs: DataFrame, key: F.Column, id_col: str = "id", min_count: int = 2
) -> DataFrame:
    """Duplicate groups by a hash key: ``(fp, n_dups, keep_id)``.

    ``keep_id`` is the smallest id in the group (the row a dedup pass keeps).
    """
    return (
        docs.select(F.md5(key).alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
        .filter(F.col("n_dups") >= min_count)
    )


def exact_dup_groups_sql(docs_sql: str, key_sql: str, id_col: str = "id", min_count: int = 2) -> str:
    return f"""
SELECT md5({key_sql}) AS fp, CAST(count(*) AS BIGINT) AS n_dups, min("{id_col}") AS keep_id
FROM ({docs_sql}) GROUP BY fp HAVING count(*) >= {min_count}"""


# ---------------------------------------------------------------------------
# Shingles + n-gram Jaccard
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, text_col: str = "document", id_col: str = "id") -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(id, sh)``.

    The token array is materialized as a column BEFORE the n-gram
    ``transform``: Catalyst does no common-subexpression elimination inside
    lambda bodies, so inlining ``tokens(...)`` there re-runs split+filter
    per element_at — measured 3× slower on the full minhash pipeline.
    """
    toked = docs.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        "id", F.explode(F.array_distinct(word_ngrams(F.col("__toks"), n))).alias("sh")
    )


def _shingles_sql(docs_sql: str, n: int, text_col: str = "document", id_col: str = "id") -> str:
    toks = tokens_sql(f'"{text_col}"')
    return f"""
SELECT "{id_col}" AS id, unnest(list_distinct({word_ngrams_sql(f"({toks})", n)})) AS sh
FROM ({docs_sql})"""


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, jac)`` with Jaccard >= threshold over
    word-``n``-gram shingle sets (id_a < id_b).

    Without ``candidates`` this self-joins on shared shingles (exact but
    quadratic in per-shingle doc frequency — fine for verification);
    with a candidate pair DataFrame (e.g. from :func:`minhash_candidates`)
    only those pairs are verified.
    """
    sh = shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if candidates is None:
        a = sh.select(F.col("id").alias("id_a"), "sh")
        b = sh.select(F.col("id").alias("id_b"), "sh")
        common = (
            a.join(b, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("c"))
        )
    else:
        a = sh.select(F.col("id").alias("id_a"), "sh")
        b = sh.select(F.col("id").alias("id_b"), "sh")
        common = (
            candidates.join(a, "id_a").join(b, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("c"))
        )
    jac = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.round(
                    F.col("c").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("c")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("jac"),
        )
    )
    return jac.filter(F.col("jac") >= threshold)


def jaccard_pairs_sql(docs_sql: str, threshold: float, n: int = 3) -> str:
    sh = _shingles_sql(docs_sql, n)
    return f"""
WITH __sh AS ({sh}),
__sizes AS (SELECT id, count(*) AS sz FROM __sh GROUP BY id),
__common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
  FROM __sh a JOIN __sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY id_a, id_b
)
SELECT id_a, id_b, jac FROM (
  SELECT id_a, id_b,
         (round(CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE), 6) + 0.0) AS jac
  FROM __common JOIN __sizes sa ON id_a = sa.id JOIN __sizes sb ON id_b = sb.id
) WHERE jac >= {threshold!r}"""


def jaccard_prefix_candidates(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """EXACT candidate pairs for Jaccard >= threshold via prefix filtering
    (the AllPairs/PPJoin principle): order every set by a global total order
    (document frequency ascending, shingle ascending) and join only each
    set's first ``|S| - ceil(t*|S|) + 1`` shingles — two sets with
    Jaccard >= t MUST share a prefix element, so recall is 1.0 while the
    join touches only rare shingles. This replaces the quadratic
    shared-shingle self-join (quadratic in per-shingle doc frequency) with
    a bounded one at any corpus size; no global rank is materialized — the
    total order is just the per-doc window comparator.
    """
    from pyspark.sql import Window

    sh = shingles(docs, n, text_col, id_col)
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("__df"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("__sz"))
    w = Window.partitionBy("id").orderBy(F.col("__df").asc(), F.col("sh").asc())
    prefix = (
        sh.join(dfreq, "sh")
        .join(sizes, "id")
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.col("__sz") - F.ceil(F.lit(float(threshold)) * F.col("__sz")) + 1
        )
        .select("id", "sh")
    )
    a = prefix.select(F.col("id").alias("id_a"), "sh")
    b = prefix.select(F.col("id").alias("id_b"), "sh")
    return (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# Universal-hash permutation family over one md5 base hash:
#   h_p(x) = (a_p * (md5_long(x) mod P) + b_p) mod P,  P = 2^31 - 1
# One md5 per (doc, shingle) row instead of num_perm of them — measured
# 13.9s -> ~6s at sf0.1. Products stay < 2^62 so the arithmetic is exact
# in Spark longs AND DuckDB BIGINTs (DuckDB raises on overflow). Seeds are
# fixed so both twins generate identical permutations.
_MERSENNE_P = (1 << 31) - 1


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    rnd = __import__("random").Random(0x5EED)
    return [(rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P)) for _ in range(num_perm)]


def minhash_signatures(
    docs: DataFrame, num_perm: int = 16, n: int = 3, text_col: str = "document", id_col: str = "id"
) -> DataFrame:
    """``(id, m0..m{P-1})`` minhash signature columns (universal-hash
    permutations over a single md5 base — deterministic, engine-portable)."""
    sh = shingles(docs, n, text_col, id_col).select(
        "id", (md5_long(F.col("sh")) % _MERSENNE_P).alias("__h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % _MERSENNE_P).alias(f"m{p}")
        for p, (a, b) in enumerate(_perm_params(num_perm))
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_bands(
    signatures: DataFrame, bands: int, rows: int, id_col: str = "id"
) -> DataFrame:
    """``(id, band, bh)`` LSH band-bucket rows from signature columns —
    the persistable unit of an incremental minhash index (one row per
    (record, band); corpus text is NOT needed to match future batches)."""
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows + r}").cast("string") for r in range(rows)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), md5_long(F.concat_ws("|", *cols)).alias("bh"))
        )
    return signatures.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def minhash_candidates(
    signatures: DataFrame, bands: int, rows: int, id_col: str = "id"
) -> DataFrame:
    """LSH banding: pairs sharing any band bucket; ``(id_a, id_b)`` distinct."""
    banded = minhash_bands(signatures, bands, rows, id_col)
    a = banded.select(F.col("id").alias("id_a"), "band", "bh")
    b2 = banded.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b2, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Full minhash pipeline: signatures -> LSH candidates -> exact Jaccard
    verification at ``threshold``. The scalable near-dup path: no all-pairs
    join ever materializes."""
    rows = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, text_col, id_col)
    cand = minhash_candidates(sig, bands, rows, "id")
    return jaccard_pairs(docs, threshold, n, text_col, id_col, candidates=cand)


def write_minhash_index(
    docs: DataFrame,
    path: str,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
) -> dict:
    """Persist the corpus's LSH band table PARTITIONED BY band — the
    incremental-dedup index. Future batches match against it with one
    equi-join; the corpus text is never rescanned. Returns the params dict
    that must be reused for every later batch (signatures are only
    comparable under identical (num_perm, bands, n))."""
    rows = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, text_col, id_col)
    minhash_bands(sig, bands, rows, "id").repartition("band").write.mode(
        "overwrite"
    ).partitionBy("band").parquet(path)
    return {"num_perm": num_perm, "bands": bands, "rows": rows, "n": n}


def minhash_incremental_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_bands: DataFrame,
    threshold: float,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Incremental near-dup detection: every pair ``(id_a, id_b, jac)``
    with Jaccard >= threshold where AT LEAST ONE side is in ``new_docs`` —
    new-vs-corpus via the persisted band table plus new-vs-new within the
    batch. Equals the full-corpus :func:`minhash_dedup_pairs` result
    filtered to pairs touching the batch (signatures are deterministic, so
    recompute == stored).

    Corpus reads are bounded by the candidates, never the corpus: the band
    join touches only the batch's band buckets, and exact verification
    hydrates shingles ONLY for candidate corpus ids (a semi-join before
    shingling — the winners-only-hydration pattern). ``corpus_docs`` may
    exclude the batch or not; self-pairs and batch-side duplicates of the
    band table are dropped."""
    rows = num_perm // bands
    sig_new = minhash_signatures(new_docs, num_perm, n, text_col, id_col)
    bands_new = minhash_bands(sig_new, bands, rows, "id")
    new_ids = new_docs.select(F.col(id_col).alias("id"))
    # new-vs-corpus: one pruned equi-join against the persisted band table
    cand_cross = (
        bands_new.withColumnsRenamed({"id": "id_n"})
        .join(corpus_bands.join(new_ids, "id", "anti"), ["band", "bh"])
        .select(
            F.least(F.col("id_n"), F.col("id")).alias("id_a"),
            F.greatest(F.col("id_n"), F.col("id")).alias("id_b"),
        )
        .distinct()
    )
    cand_within = minhash_candidates(sig_new, bands, rows, "id")
    cand = cand_cross.unionByName(cand_within).distinct()
    # hydrate only candidate corpus docs for exact verification
    cand_ids = cand.select(F.col("id_a").alias("id")).unionByName(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    hydrated = (
        corpus_docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("document"))
        .join(new_ids, "id", "anti")
        .unionByName(
            new_docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("document"))
        )
        .join(cand_ids, "id", "semi")
    )
    return jaccard_pairs(hydrated, threshold, n, "document", "id", candidates=cand)


def minhash_incremental_pairs_sql(
    docs_sql: str,
    new_pred_sql: str,
    threshold: float,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
) -> str:
    """Oracle twin: the full-corpus pair set filtered to pairs with at
    least one side satisfying ``new_pred_sql`` (a predicate over ``id``
    aliased ``id_a``/``id_b``)."""
    full = minhash_dedup_pairs_sql(docs_sql, threshold, num_perm, bands, n)
    return (
        f"SELECT * FROM ({full})\n"
        f"WHERE ({new_pred_sql.replace('__ID__', 'id_a')}) "
        f"OR ({new_pred_sql.replace('__ID__', 'id_b')})"
    )


def minhash_dedup_pairs_sql(
    docs_sql: str, threshold: float, num_perm: int = 16, bands: int = 4, n: int = 3
) -> str:
    rows = num_perm // bands
    sh = _shingles_sql(docs_sql, n)
    mins = ",\n         ".join(
        f"min(({a} * ({md5_long_sql('sh')} % {_MERSENNE_P}) + {b}) % {_MERSENNE_P}) AS m{p}"
        for p, (a, b) in enumerate(_perm_params(num_perm))
    )
    band_rows = []
    for b in range(bands):
        concat = " || '|' || ".join(f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_rows.append(f"SELECT id, {b} AS band, {md5_long_sql(f'({concat})')} AS bh FROM __sig")
    bands_sql = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH __sh AS ({sh}),
__sig AS (SELECT id, {mins} FROM __sh GROUP BY id),
__banded AS ({bands_sql}),
__cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM __banded a JOIN __banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
__sizes AS (SELECT id, count(*) AS sz FROM __sh GROUP BY id),
__common AS (
  SELECT c.id_a, c.id_b, count(*) AS cnt
  FROM __cand c JOIN __sh a ON c.id_a = a.id JOIN __sh b ON c.id_b = b.id AND a.sh = b.sh
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, jac FROM (
  SELECT id_a, id_b,
         (round(CAST(cnt AS DOUBLE) / CAST(sa.sz + sb.sz - cnt AS DOUBLE), 6) + 0.0) AS jac
  FROM __common JOIN __sizes sa ON id_a = sa.id JOIN __sizes sb ON id_b = sb.id
) WHERE jac >= {threshold!r}"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_signatures(
    docs: DataFrame, bits: int = SIMHASH_BITS, text_col: str = "document", id_col: str = "id"
) -> DataFrame:
    """``(id, simhash BIGINT)``: tf-weighted simhash over md5 token hashes."""
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .select("id", "tf", md5_long(F.col("term")).alias("h"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = tf.groupBy("id").agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return per_doc.select("id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int,
    bits: int = SIMHASH_BITS,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """``(id_a, id_b, hamming)`` pairs within ``max_hamming``.

    All-pairs comparison — the pytest cross-check oracle for
    :func:`simhash_pairs_banded`, which is the registered/scale path.
    """
    sig = simhash_signatures(docs, bits, text_col, id_col)
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_banded(
    docs: DataFrame,
    max_hamming: int,
    bits: int = SIMHASH_BITS,
    text_col: str = "document",
    id_col: str = "id",
    bands: int | None = None,
) -> DataFrame:
    """Scale-safe simhash pairs — EXACT, no CartesianProduct.

    The signature is cut into ``bands`` (default ``max_hamming + 1``)
    bit-bands; two signatures within ``max_hamming`` differing bits must
    share at least one band unchanged (pigeonhole), so an equi-join on
    ``(band, band_bits)`` generates a candidate superset with perfect
    recall, and the exact hamming filter then reproduces the all-pairs
    result verbatim. The shuffle key is the band value — uniformly
    distributed by construction — so this is one bucketed self-join at any
    corpus size.
    """
    bands = bands or (max_hamming + 1)
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall (pigeonhole)")
    sig = simhash_signatures(docs, bits, text_col, id_col)
    width, rem = divmod(bits, bands)
    spans, start = [], 0
    for b in range(bands):
        w = width + (1 if b < rem else 0)
        spans.append((start, w))
        start += w
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << w) - 1)).alias("bv"),
        )
        for b, (off, w) in enumerate(spans)
    ]
    banded = sig.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("x")
    ).select("id", "simhash", F.col("x.band").alias("band"), F.col("x.bv").alias("bv"))
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"), "band", "bv")
    b2 = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"), "band", "bv")
    return (
        a.join(b2, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide in several bands
    )


def simhash_pairs_sql(
    docs_sql: str, max_hamming: int, bits: int = SIMHASH_BITS
) -> str:
    toks = tokens_sql('"document"')
    vsums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS v{b}" for b in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END" for b in range(bits))
    return f"""
WITH __tf AS (
  SELECT id, term, count(*) AS tf, {md5_long_sql("term")} AS h FROM (
    SELECT "id" AS id, unnest({toks}) AS term FROM ({docs_sql})
  ) GROUP BY id, term
),
__v AS (SELECT id, {vsums} FROM __tf GROUP BY id),
__sig AS (SELECT id, ({sig}) AS simhash FROM __v)
SELECT a.id AS id_a, b.id AS id_b, CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM __sig a JOIN __sig b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_topk(
    records: DataFrame, k: int, id_col: str = "id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-``k`` most-similar pairs by cosine distance: ``(id_a, id_b, dist)``.

    Brute-force pair scan (verification scale); the scale path restricts
    pairs to shared IVF centroid buckets (see ann/)."""
    from ..functions.distance import cosine

    a = records.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = records.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.round(cosine(F.col("va"), F.col("vb")), 6) + F.lit(0.0)).alias("dist"),
        )
    )
    return pairs.orderBy(F.col("dist").asc(), F.col("id_a").asc(), F.col("id_b").asc()).limit(k)


def embedding_neardup_topk_sql(records_sql: str, k: int) -> str:
    from ..functions.distance import cosine_sql

    d = cosine_sql("a.embedding", "b.embedding")
    return f"""
SELECT id_a, id_b, dist FROM (
  SELECT a.id AS id_a, b.id AS id_b, (round({d}, 6) + 0.0) AS dist
  FROM ({records_sql}) a JOIN ({records_sql}) b ON a.id < b.id
) ORDER BY dist ASC, id_a ASC, id_b ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# Banded (sign-LSH) embedding near-dup — the scale path. Deterministic
# random-hyperplane signs are generated once in Python and shared VERBATIM
# by the Spark expression and the SQL twin, so the two sides band
# identically and the oracle gate is exact even though the algorithm is
# approximate vs all-pairs (recall is pytest-measured on planted dups).
# ---------------------------------------------------------------------------


def _lsh_signs(n_bits: int, dim: int, seed: int = 0x51E9) -> list[list[float]]:
    rnd = __import__("random").Random(seed)
    return [[1.0 if rnd.random() < 0.5 else -1.0 for _ in range(dim)] for _ in range(n_bits)]


def _band_spans(n_bits: int, bands: int) -> list[list[int]]:
    width, rem = divmod(n_bits, bands)
    out, start = [], 0
    for b in range(bands):
        w = width + (1 if b < rem else 0)
        out.append(list(range(start, start + w)))
        start += w
    return out


def embedding_neardup_banded(
    records: DataFrame,
    threshold: float,
    dim: int,
    n_bits: int = 16,
    bands: int = 4,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, dist)`` with cosine distance <=
    ``threshold`` among sign-LSH candidates — no CartesianProduct.

    bit_j = sign of <v, r_j> for seeded ±1 hyperplanes r_j (rounded to 6
    decimals before the sign so both engines agree bit-for-bit); bits are
    grouped into ``bands`` band values; candidates are pairs sharing any
    band (one equi-join on (band, value)); candidates are verified with the
    exact cosine distance. For true near-dups (small angle) per-bit
    agreement is ~1 - theta/pi, so recall approaches 1 with a few bands;
    random pairs rarely share a band, which is what removes the quadratic
    blow-up at 100 TB.
    """
    from ..functions.distance import cosine

    signs = _lsh_signs(n_bits, dim)
    bits = []
    for j in range(n_bits):
        sj = F.array(*[F.lit(s) for s in signs[j]])
        dotj = F.aggregate(
            F.zip_with(F.col(vec_col), sj, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append((F.round(dotj, 6) > 0).cast("long"))
    band_structs = []
    for b, span in enumerate(_band_spans(n_bits, bands)):
        bv = F.lit(0).cast("long")
        for r, j in enumerate(span):
            bv = bv + bits[j] * F.lit(1 << r).cast("long")
        band_structs.append(F.struct(F.lit(b).alias("band"), bv.alias("bv")))
    banded = records.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(F.array(*band_structs)).alias("x"),
    ).select("id", "v", F.col("x.band").alias("band"), F.col("x.bv").alias("bv"))
    a = banded.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "band", "bv")
    b2 = banded.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "band", "bv")
    cand = (
        a.join(b2, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            (F.round(cosine(F.col("va"), F.col("vb")), 6) + F.lit(0.0)).alias("dist"),
        )
        .filter(F.col("dist") <= threshold)
    )


def embedding_neardup_banded_sql(
    records_sql: str, threshold: float, dim: int, n_bits: int = 16, bands: int = 4
) -> str:
    from ..functions.distance import cosine_sql, dot_sql

    signs = _lsh_signs(n_bits, dim)
    bit_cols = []
    for j in range(n_bits):
        arr = "[" + ", ".join(repr(s) for s in signs[j]) + "]"
        bit_cols.append(
            f"CASE WHEN round({dot_sql('embedding', arr)}, 6) > 0 THEN 1 ELSE 0 END AS b{j}"
        )
    band_rows = []
    for b, span in enumerate(_band_spans(n_bits, bands)):
        bv = " + ".join(f"(b{j} * {1 << r})" for r, j in enumerate(span))
        band_rows.append(f"SELECT id, {b} AS band, ({bv}) AS bv FROM __bits")
    bands_sql = "\nUNION ALL\n".join(band_rows)
    d = cosine_sql("ra.embedding", "rb.embedding")
    return f"""
WITH __r AS ({records_sql}),
__bits AS (SELECT id, embedding, {", ".join(bit_cols)} FROM __r),
__bands AS ({bands_sql}),
__cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM __bands a JOIN __bands b ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
)
SELECT id_a, id_b, dist FROM (
  SELECT c.id_a, c.id_b, (round({d}, 6) + 0.0) AS dist
  FROM __cand c JOIN __r ra ON c.id_a = ra.id JOIN __r rb ON c.id_b = rb.id
) WHERE dist <= {threshold!r}"""


def embedding_neardup_ivf(
    postings: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed near-dup: candidate pairs share an IVF posting list
    (``ann.ivf.build_ivf`` postings; ``replicas > 1`` multi-assignment
    recovers boundary pairs). K-means is not SQL-expressible, so this is
    the pytest-verified variant (recall vs all-pairs); the sign-LSH banded
    form above is the oracle-gated one.
    """
    from ..functions.distance import cosine

    a = postings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "centroid_id"
    )
    b = postings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "centroid_id"
    )
    cand = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            (F.round(cosine(F.col("va"), F.col("vb")), 6) + F.lit(0.0)).alias("dist"),
        )
        .filter(F.col("dist") <= threshold)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """``(id, canonical)`` for every id in ``pairs``: canonical = the MIN id
    of the id's connected component — the step that turns near-dup PAIRS
    into dedup DECISIONS (keep rows where id == canonical, or audit the
    rest). Iterative min-label propagation: each round every vertex adopts
    the smallest label among itself and its neighbors, converging in
    O(log chain-length) rounds: after adopting the neighborhood minimum,
    each vertex additionally follows ONE HOP through the previous label
    table (pointer jumping — ``label(x) <= x`` and stays in-component, so
    ``least`` over the hop is safe), doubling label-propagation distance
    per round; a duplicate chain of length L converges in O(log L) rounds,
    so ``max_iter=50`` covers chains up to ~2**50. The per-round
    convergence count is FOLDED into the checkpointed frame as a ``chg``
    flag (one cheap local aggregate — no old-vs-new join). The driver only
    sees that COUNT; labels stay distributed, and ``localCheckpoint`` cuts
    the join lineage so plans don't grow exponentially. At planetary graph
    sizes swap in the alternating large-star/small-star formulation; the
    fixpoint (and therefore the output) is identical. Warns — never
    silently splits a component — if the cap is somehow exhausted.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize ONCE: every round joins edges, and without the cut
        # each round re-evaluates the whole candidate-pair subtree (for
        # semdedup that is the within-cluster cosine join) — O(rounds)
        # recomputes for a table only 2x the pair count
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    labels = labels.localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nb_min"))
        )
        stepped = labels.join(neighbor_min, labels.id == neighbor_min.src, "left").select(
            labels.id,
            labels.label.alias("old"),
            F.least(labels.label, F.coalesce(F.col("nb_min"), labels.label)).alias("mid"),
        )
        hop = labels.select(F.col("id").alias("hid"), F.col("label").alias("hlabel"))
        new_labels = (
            stepped.join(hop, stepped.mid == hop.hid, "left")
            .select(
                stepped.id,
                F.least(F.col("mid"), F.coalesce(F.col("hlabel"), F.col("mid"))).alias("label"),
                (F.col("mid") != F.col("old")).cast("int").alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum("chg")).first()[0] or 0
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    if changed:
        import warnings

        warnings.warn(
            f"connected_components: max_iter={max_iter} exhausted with {changed} "
            "labels still changing; output may split a component across several "
            "canonical ids — raise max_iter (rounds are O(log chain-length))",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", F.col("label").alias("canonical"))


def connected_components_sql(pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b") -> str:
    """Transitive-closure oracle: reachability via a recursive CTE, then
    canonical = min over the reachable set (including self)."""
    return f"""
WITH RECURSIVE __p AS (SELECT * FROM ({pairs_sql})),
__e AS (
  SELECT "{id_a}" AS a, "{id_b}" AS b FROM __p
  UNION
  SELECT "{id_b}", "{id_a}" FROM __p
),
reach(src, dst) AS (
  SELECT a, a FROM __e
  UNION
  SELECT r.src, e.b FROM reach r JOIN __e e ON r.dst = e.a
)
SELECT src AS id, min(dst) AS canonical FROM reach GROUP BY src"""


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup inside embedding clusters (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication"). Cluster the embedding space (k-means / the collection's
# IVF layout), connect within-cluster pairs whose cosine distance clears a
# threshold, and keep ONE document per duplicate group — the member
# FURTHEST from its cluster centroid (the paper's "keep low similarity to
# centroid" policy, which preserved the most diversity in their ablation).
#
# Reference parity note: chroma has no semantic dedup — this extends the
# beyond-the-reference pipeline surface (SURVEY §7) alongside the sign-LSH
# near-dup (`embedding_neardup_banded`) which finds PAIRS; semdedup turns
# cluster-local pairs into keep/drop DECISIONS.
#
# Scale shape (100 TB): candidate generation is within-cluster pairwise —
# O(sum c_i^2) = O(N^2 / k) for balanced clusters, the SAME budget the
# paper runs on web scale (k grows with N; their config keeps clusters
# ~10^4). Every join is keyed by cluster id (no CartesianProduct — pinned
# in tests), components run pointer-jumping rounds, and the keeper choice
# is one window over group members. With a built IVF layout the
# assignment is free (postings already store centroid_id).
# ---------------------------------------------------------------------------


def semdedup(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
    centroid_dist_col: str = "cd",
    method: str = "expr",
) -> DataFrame:
    """Keep/drop decision per row from a cluster assignment frame
    ``(id, embedding, centroid_id, cd)`` where ``cd`` is the row's
    (rounded) cosine distance to its own cluster centroid.

    Returns ``(id, group, cd, keep)``: ``group`` = min id of the row's
    within-cluster duplicate component (own id for singletons), ``keep`` =
    true for the component member with the LARGEST centroid distance
    (ties: smallest id) and for all singletons.

    ``method="expr"`` (DuckDB-parity oracle path) generates pairs with the
    Catalyst cosine expression; ``"arrow"`` is the bulk tier
    (:func:`semdedup_pairs_arrow`, per-cluster GEMM) for corpus-scale runs.
    """
    from pyspark.sql import Window

    from ..functions.distance import cosine

    if method == "arrow":
        pairs = semdedup_pairs_arrow(
            assigned, threshold, id_col=id_col, vec_col=vec_col, cluster_col=cluster_col
        )
    else:
        a = assigned.select(
            F.col(cluster_col).alias("__c"),
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
        )
        b = assigned.select(
            F.col(cluster_col).alias("__c"),
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
        )
        dist = F.round(cosine(F.col("va"), F.col("vb")), 6) + F.lit(0.0)
        pairs = (
            a.join(b, "__c")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dist.alias("__d"))
            .filter(F.col("__d") <= threshold)
        )
    comp = connected_components(pairs)
    members = assigned.select(
        F.col(id_col).alias("id"), F.col(centroid_dist_col).alias("cd")
    ).join(comp, "id")
    w = Window.partitionBy("canonical").orderBy(F.col("cd").desc(), F.col("id").asc())
    dups = members.select(
        "id",
        F.col("canonical").alias("group"),
        "cd",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    singles = (
        assigned.select(F.col(id_col).alias("id"), F.col(centroid_dist_col).alias("cd"))
        .join(comp.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("group"), "cd", F.lit(True).alias("keep"))
    )
    return dups.unionByName(singles)


def semdedup_sql(assigned_sql: str, threshold: float) -> str:
    """DuckDB twin over an ``(id, embedding, centroid_id, cd)`` assignment
    relation (the registry supplies a fixed-centroid assignment so the
    whole pipeline is bit-deterministic)."""
    from ..functions.distance import cosine_sql

    d = cosine_sql("a.embedding", "b.embedding")
    pairs = f"""
WITH __asg AS ({assigned_sql})
SELECT id_a, id_b FROM (
  SELECT a.id AS id_a, b.id AS id_b, (round({d}, 6) + 0.0) AS __d
  FROM __asg a JOIN __asg b ON a.centroid_id = b.centroid_id AND a.id < b.id
) WHERE __d <= {threshold!r}"""
    comp = connected_components_sql(pairs)
    return f"""
WITH __asg2 AS ({assigned_sql}),
__comp AS ({comp}),
__dups AS (
  SELECT m.id, c.canonical AS "group", m.cd,
         row_number() OVER (PARTITION BY c.canonical
                            ORDER BY m.cd DESC, m.id ASC) = 1 AS keep
  FROM __asg2 m JOIN __comp c ON m.id = c.id
)
SELECT id, "group", cd, keep FROM __dups
UNION ALL
SELECT m.id, m.id AS "group", m.cd, TRUE AS keep
FROM __asg2 m ANTI JOIN __comp c ON m.id = c.id"""


def semdedup_from_postings(
    postings: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """SemDeDup served from a built IVF layout: ``postings`` already carry
    ``(centroid_id, id, embedding)`` (assignment cost zero — the same
    free-ride as `sample_cluster_balanced_from_postings`); ``centroids``
    is the layout's ``(centroid_id, centroid)`` table. K-means layouts are
    not SQL-expressible, so this form is pytest-verified against
    `semdedup` on the same assignment."""
    assigned = primary_assignment(postings, centroids, id_col=id_col, vec_col=vec_col)
    return semdedup(assigned, threshold, vec_col=vec_col, method=method)


def primary_assignment(
    postings: DataFrame,
    centroids: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, embedding, centroid_id, cd)`` — each row's PRIMARY cluster
    from a (possibly replicated) posting table: the closest centroid by
    rounded cosine distance (deterministic — not ``dropDuplicates``, whose
    surviving row is partition-order dependent)."""
    from ..functions.distance import cosine

    from .topk import topk_per_group

    cd = F.round(cosine(F.col(vec_col), F.col("centroid")), 6) + F.lit(0.0)
    return topk_per_group(
        postings.select("centroid_id", F.col(id_col).alias("id"), F.col(vec_col))
        .join(F.broadcast(centroids), "centroid_id")
        .select("id", F.col(vec_col), "centroid_id", cd.alias("cd")),
        ["id"],
        [F.col("cd").asc(), F.col("centroid_id").asc()],
        1,
        two_stage=False,
    )


def semdedup_pairs_arrow(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
    block: int = 2048,
) -> DataFrame:
    """Within-cluster cosine-distance pairs via a per-cluster numpy GEMM
    (``applyInPandas`` keyed by cluster — one Arrow batch per posting
    list). The bulk tier of the same arrow-vs-expr split used everywhere
    else (``ann/ivf assign_to_centroids``): interpreted array-lambda
    cosine over the O(N^2/k) within-cluster pairs is the scale killer,
    a blocked ``B @ X.T`` is ~100x faster; the expr form inside
    :func:`semdedup` remains the DuckDB-parity oracle path. Distances are
    rounded to 6dp with the same eps as the expr form, so pair sets can
    differ only at 1e-6 rounding knife-edges (float-sum order). ``block``
    caps the similarity-matrix slab at ``block x cluster_size`` so a
    skewed giant cluster streams instead of materializing c^2 floats.
    """
    import numpy as np
    import pandas as pd

    from ..functions.distance import NORM_EPS

    id_type = dict(assigned.dtypes)[id_col]
    thr = float(threshold)
    blk = int(block)

    def emit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pdf[id_col][:0], "id_b": pdf[id_col][:0]})
        ids = pdf[id_col].to_numpy()
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        out_a, out_b = [], []
        for s in range(0, n, blk):
            b = x[s : s + blk]
            d = 1.0 - (b @ x.T) / (np.outer(norms[s : s + blk], norms) + NORM_EPS)
            d = np.round(d, 6) + 0.0
            ii, jj = np.nonzero(d <= thr)
            gi, gj = ids[s + ii], ids[jj]
            m = gi < gj
            out_a.append(gi[m])
            out_b.append(gj[m])
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    return (
        assigned.select(cluster_col, id_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(emit, f"id_a {id_type}, id_b {id_type}")
    )
