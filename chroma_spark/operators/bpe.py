"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the canonical
subword tokenization of LLM training pipelines, built Spark-first:

- **Training is vocabulary-bounded, not corpus-bounded**: one distributed
  word count (map-side combined groupBy) collapses the corpus to a
  ``(word, freq)`` table; merges are learned from the top ``max_words``
  rows of that table (a config-sized driver collect — the same discipline
  as every fast BPE trainer, which iterates word *types* weighted by
  frequency, never token instances). 100 TB of text has a few million
  distinct words; the shuffle is the only corpus-sized cost.
- **Applying merges is pure Catalyst — no UDF**: a learned merge list is
  config-sized, so each merge rule becomes a plan literal: one
  ``replace(sym_str, SEP+a+SEP + SEP+b+SEP, SEP+ab+SEP)`` over a symbol
  string in which EVERY symbol is wrapped ``SEP<text>SEP`` (so adjacent
  symbols meet at a double SEP). Sequential non-overlapping ``replace``
  is exactly BPE's left-to-right single-pass merge (see ``_merge_seq``),
  and the both-sides wrapping makes matches whole-symbol-anchored: since
  symbol text never contains SEP, ``SEP a SEP`` can only match the
  complete symbol ``a`` — never a prefix/suffix of a longer symbol (a
  prefix-only encoding fails on e.g. merge ``(i, n)`` matching inside the
  symbol ``n</w>``). The same chain runs verbatim in DuckDB for the
  oracle twins.
- **Tokenization joins, it doesn't recompute**: documents explode to
  ``(id, pos, word)``, DISTINCT words are segmented once (vocab-bounded
  frame), and a join + ordered reassembly rebuilds per-document token
  arrays — the per-word cache every fast tokenizer keeps, expressed as a
  join Catalyst can broadcast when the vocabulary is small.

Merge-application semantics (pinned by tests): merges apply **in learned
order, one left-to-right pass each** — the trainer's incremental vocab
updates produce exactly this composition, so training segmentation and
apply segmentation agree on every seen word. (A later merge can create a
new occurrence of an earlier pair only by synthesizing an identical
symbol text; the trainer then simply re-learns that pair later if it
matters — standard BPE behavior.)

Reference parity note: chroma has no tokenizer — this extends the
beyond-the-reference training-data surface (SURVEY §7); the reference's
only text units are FTS trigrams (``rust/index/src/fulltext/``) and the
BM25 token hasher (``chromadb/utils/embedding_functions/``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import sql_lit, tokens, tokens_sql

# symbol-boundary sentinel: ASCII record separator — not whitespace (so it
# survives the whitespace pre-tokenizer) and stripped from input words
# defensively; chr(30) in the SQL twins
SEP = "\x1e"
# end-of-word marker symbol (Sennrich's </w>): lets merges distinguish
# word-final units ("er" vs "er</w>") exactly like the original algorithm
EOW = "</w>"


def _encode_word(word: Column) -> Column:
    """word -> wrapped symbol string: ``"the"`` ->
    ``"\\x1et\\x1e\\x1eh\\x1e\\x1ee\\x1e\\x1e</w>\\x1e"``. Every symbol is
    wrapped SEP…SEP (adjacent symbols meet at a double SEP), so a merge
    pattern matches exactly a whole-symbol pair and its replacement keeps
    the wrapping invariant — consecutive same-pair runs merge
    left-to-right like ``_merge_seq``."""
    chars = F.split(F.replace(word, F.lit(SEP), F.lit("")), "")
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP + SEP + EOW + SEP)
    )


def _encode_word_sql(word: str) -> str:
    return (
        f"(chr(30) || array_to_string(string_split(replace({word}, chr(30), ''), ''),"
        f" chr(30) || chr(30)) || chr(30) || chr(30) || '</w>' || chr(30))"
    )


def segment(word: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` BPE symbols of one word under ``merges`` (applied
    in order, one left-to-right pass each — plan literals, no UDF)."""
    s = _encode_word(word)
    for a, b in merges:
        s = F.replace(
            s, F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP)
        )
    return F.filter(F.split(s, SEP), lambda t: t != "")


def segment_sql(word: str, merges: list[tuple[str, str]]) -> str:
    s = _encode_word_sql(word)
    for a, b in merges:
        pat = f"chr(30) || {sql_lit(a)} || chr(30) || chr(30) || {sql_lit(b)} || chr(30)"
        rep = f"chr(30) || {sql_lit(a + b)} || chr(30)"
        s = f"replace({s}, {pat}, {rep})"
    return f"list_filter(string_split({s}, chr(30)), t -> t != '')"


def _merge_seq(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """One left-to-right non-overlapping pass of a single merge rule — the
    Python reference for what one chained ``replace`` does."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """Learn ``n_merges`` merges from ``(word, freq)`` pairs. Returns
    ``(merges, final_vocab)`` where ``final_vocab[word]`` is the word's
    segmentation under the learned merges (train/apply self-consistency is
    pinned by tests). Deterministic: ties on pair frequency break to the
    lexicographically smallest pair."""
    vocab: list[tuple[list[str], int]] = [
        (list(w.replace(SEP, "")) + [EOW], int(c)) for w, c in word_freqs
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing repeats — further merges just memorize words
        merges.append(best)
        vocab = [(_merge_seq(syms, best), c) for syms, c in vocab]
    final = {"".join(syms).removesuffix(EOW): syms for syms, _ in vocab}
    return merges, final


def word_frequencies(
    docs: DataFrame, text_col: str = "document", max_words: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed word count -> top ``max_words`` types by (freq desc,
    word asc). The collect is bounded by ``max_words`` (config-sized): BPE
    statistics live on word *types*, which grow sub-linearly in corpus
    bytes — the tail types beyond the cap carry negligible pair mass."""
    rows = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r.w, r.c) for r in rows]


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "document",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word count + local merge loop."""
    merges, _ = train_local(word_frequencies(docs, text_col, max_words), n_merges)
    return merges


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """``(id, bpe_tokens array<string>)`` per document: distinct-word
    segmentation joined back and reassembled in word order."""
    wl = docs.select(
        F.col(id_col).alias("id"), F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    segs = wl.select("w").distinct().withColumn("syms", segment(F.col("w"), merges))
    return (
        wl.join(segs, "w")
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))), lambda x: x.syms
                )
            ).alias("bpe_tokens")
        )
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """``(id, n_words, n_bpe, head)`` — token-budget accounting per doc
    under a merge table, plus the first 8 symbols (order-sensitive, so the
    oracle checks reassembly order too). Documents with no tokens keep
    ``n_words = n_bpe = 0`` and an empty head."""
    toks = bpe_tokenize(docs, merges, text_col, id_col)
    base = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(F.col(text_col))).alias("n_words")
    )
    return (
        base.join(toks, "id", "left")
        .select(
            "id",
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce(F.size("bpe_tokens"), F.lit(0)).cast("long").alias("n_bpe"),
            F.concat_ws(
                " ",
                F.slice(F.coalesce(F.col("bpe_tokens"), F.array().cast("array<string>")), 1, 8),
            ).alias("head"),
        )
    )


def bpe_token_counts_sql(
    docs_sql: str, merges: list[tuple[str, str]], text_col: str = "document"
) -> str:
    seg = segment_sql("w", merges)
    return f"""
WITH __docs AS ({docs_sql}),
__toks AS (SELECT id, {tokens_sql(text_col)} AS toks FROM __docs),
__pos AS (SELECT id, unnest(range(1, len(toks) + 1)) AS pos, toks FROM __toks),
__words AS (SELECT id, pos, toks[pos] AS w FROM __pos),
__segs AS (SELECT w, {seg} AS syms FROM (SELECT DISTINCT w FROM __words)),
__per_doc AS (
  SELECT wl.id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(s.syms)) AS BIGINT) AS n_bpe,
         array_to_string((flatten(list(s.syms ORDER BY wl.pos)))[1:8], ' ') AS head
  FROM __words wl JOIN __segs s ON wl.w = s.w
  GROUP BY wl.id
)
SELECT d.id, coalesce(p.n_words, 0) AS n_words, coalesce(p.n_bpe, 0) AS n_bpe,
       coalesce(p.head, '') AS head
FROM __docs d LEFT JOIN __per_doc p ON d.id = p.id"""


def bpe_symbol_frequencies(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Corpus-level ``(symbol, freq)`` under a merge table. Cardinality is
    bounded by alphabet + ``len(merges)`` — config-sized at any corpus."""
    return (
        bpe_tokenize(docs, merges, text_col, id_col)
        .select(F.explode("bpe_tokens").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def bpe_vocab_topk(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    k: int = 40,
    text_col: str = "document",
    id_col: str = "id",
) -> DataFrame:
    """Corpus-level symbol frequencies, top ``k`` by (count desc, symbol
    asc) — the learned-vocabulary histogram a tokenizer report shows."""
    from .topk import topk_per_group

    counts = bpe_symbol_frequencies(docs, merges, text_col, id_col)
    return topk_per_group(
        counts, [], [F.col("freq").desc(), F.col("symbol").asc()], k
    )


def bpe_vocab_topk_sql(
    docs_sql: str, merges: list[tuple[str, str]], k: int = 40, text_col: str = "document"
) -> str:
    seg = segment_sql("w", merges)
    return f"""
WITH __docs AS ({docs_sql}),
__words AS (SELECT unnest({tokens_sql(text_col)}) AS w FROM __docs),
__segs AS (SELECT w, {seg} AS syms FROM (SELECT DISTINCT w FROM __words)),
__sym AS (
  SELECT unnest(s.syms) AS symbol
  FROM __words wl JOIN __segs s ON wl.w = s.w
),
__freq AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS freq FROM __sym GROUP BY symbol
)
SELECT symbol, freq FROM __freq ORDER BY freq DESC, symbol ASC LIMIT {k}"""
