"""Text primitives shared by FTS, BM25, dedup and text-analysis operators.

Everything here has a Spark Column form and a DuckDB SQL twin so oracle
queries compute the identical values. Deterministic hashing uses md5 (both
engines produce identical digests) truncated to 60 bits — NOT
``F.hash``/``hash()`` whose algorithms differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokenizer over lowercased text; the BPE-ish variant splits
# letter-runs / digit-runs / single punctuation like a byte-level pre-tokenizer
TOKEN_SPLIT_RE = r"\s+"
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empty strings removed."""
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(text: str) -> str:
    return f"list_filter(string_split_regex(lower(coalesce({text}, ''))," r" '\s+'), t -> t != '')"


def sql_lit(s: str) -> str:
    """Single-quoted ANSI SQL string literal with ``''`` escaping — every
    user string interpolated into an oracle SQL twin must go through this,
    or a value containing a quote breaks cross-engine parity (the Spark
    side takes strings verbatim; only the SQL text needs escaping)."""
    return "'" + str(s).replace("'", "''") + "'"


def md5_long(s: Column) -> Column:
    """Deterministic 60-bit positive hash of a string, identical across engines."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def md5_long_sql(s: str) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token array (shingles).

    Guarded for short inputs: ``sequence(1, 0)`` in Spark is the DESCENDING
    [1, 0], not empty, so a document with fewer than ``n`` tokens must
    short-circuit to an empty array instead of indexing past the end."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), i -> {parts})"
