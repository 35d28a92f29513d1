"""Trigram FTS posting index — index-served ``$contains`` / ``$regex``.

The reference serves document filters from a full-text index rather than
scanning every document (`rust/index/src/fulltext/types.rs` — trigram
postings; `chromadb/test/property/test_filtering.py` pins the exact
substring semantics). The Spark-native equivalent: a posting table of the
DISTINCT 3-char substrings per document (raw text, case-sensitive — the
exact-match trigram alphabet `$contains` needs), bucket-partitioned by
trigram hash.

Serving a needle of length >= 3: every matching document must contain ALL
of the needle's trigrams, so candidates = ids whose posting set covers the
needle's trigram set — one partition-pruned scan of the posting buckets
(the needle's trigrams are a query-side literal IN list) + a count
aggregation, never a full-text scan. The EXACT predicate still verifies
the candidates (trigram coverage is necessary, not sufficient), hydrating
text only for candidate rows — the winners-only pattern every index-served
path here uses. Regex patterns contribute their required literals
(``regex_dialect.prefilter_literals``); needles under 3 chars or negated /
disjunctive forms fall back to the scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

TRIGRAM_N = 3


def doc_trigram_postings(
    records: DataFrame,
    n_buckets: int = 64,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Distinct ``(id, thash, bucket)`` per document — the posting rows.

    Trigrams are raw 3-char substrings (case-sensitive, whitespace
    included) so candidate generation is sound for the case-sensitive
    substring semantics of ``$contains``. One projection + explode +
    distinct; rows per doc are bounded by text length."""
    # substring with a Column start position needs the SQL expr form
    grams = F.expr(
        f"transform(sequence(1, greatest(length(coalesce(`{text_col}`, '')) - {TRIGRAM_N - 1}, 0)),"
        f" i -> substr(coalesce(`{text_col}`, ''), i, {TRIGRAM_N}))"
    )
    return (
        records.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select("id", md5_long(F.col("g")).alias("thash"))
        .distinct()
        .withColumn("bucket", (F.col("thash") % n_buckets).cast("int"))
    )


def needle_trigram_hashes(needle: str) -> list[int]:
    """The needle's distinct trigram hashes, computed driver-side with the
    python twin of ``md5_long`` (identical 60-bit truncation)."""
    grams = {needle[i : i + TRIGRAM_N] for i in range(len(needle) - TRIGRAM_N + 1)}
    return sorted(
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) for g in grams
    )


def contains_candidates(
    postings: DataFrame, needles: list[str], n_buckets: int = 64
) -> DataFrame:
    """Ids whose posting set covers EVERY trigram of EVERY needle — a
    sound superset of the documents containing all the needles. The
    trigram hashes become plan literals, so the bucket partition filter
    prunes the posting scan to the needles' buckets; the aggregation is
    one partial-aggregated count over the (tiny) filtered postings."""
    hashes = sorted({h for nd in needles for h in needle_trigram_hashes(nd)})
    if not hashes:
        raise ValueError("no trigram needles (all under 3 chars?)")
    buckets = sorted({h % n_buckets for h in hashes})
    return (
        postings.filter(F.col("bucket").isin(buckets) & F.col("thash").isin(hashes))
        .groupBy("id")
        .agg(F.count_distinct("thash").alias("__nt"))
        .filter(F.col("__nt") == len(hashes))
        .select("id")
    )


def required_needles(where_document) -> list[str]:
    """Literal substrings every matching document must contain, extracted
    from a WhereDocument tree — the sound index-usability test.

    ``$contains`` contributes its literal; ``$regex`` its required
    literals (empty under inline case-insensitivity); ``$and`` the union
    of its children's (each child must hold). ``$or`` and the negated
    forms contribute nothing (a doc can match without containing any
    particular literal). Needles under TRIGRAM_N chars are dropped —
    they have no trigram and prune too little anyway."""
    from ..regex_dialect import RegexDialectError, prefilter_literals

    if not isinstance(where_document, dict) or len(where_document) != 1:
        return []
    [(op, val)] = where_document.items()
    if op == "$contains" and isinstance(val, str) and len(val) >= TRIGRAM_N:
        return [val]
    if op == "$regex" and isinstance(val, str):
        try:
            return [l for l in prefilter_literals(val) if len(l) >= TRIGRAM_N]
        except RegexDialectError:
            return []
    if op == "$and" and isinstance(val, (list, tuple)):
        out: list[str] = []
        for child in val:
            out.extend(required_needles(child))
        return out
    return []
