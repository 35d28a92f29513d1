"""Embedding-function registry: text -> dense / sparse vectors.

Mirrors the reference's pluggable embedding-function boundary
(`chromadb/utils/embedding_functions/` — ~30 providers, each a callable
``texts -> vectors`` attached to a collection; sparse variants produce
``SparseVector``). In Spark the same boundary is an Arrow-batched pandas
UDF applied at ingest (SURVEY §2.1).

Two real, deterministic implementations (no model weights in this
container) plus import-gated stubs for the external providers:

- :class:`HashingEmbeddingFunction` — feature-hashing (the classic
  "hashing trick"): token -> md5 bucket, tf weights, L2-normalized. Uses
  the same md5-truncation as functions/text.py so a DuckDB SQL twin can
  recompute identical vectors — the oracle gate covers the whole
  pandas-UDF embed path by value.
- :class:`Bm25SparseEmbeddingFunction` — BM25 tf-component weights over
  hashed tokens, strictly-ascending indices (SparseVector contract,
  `chromadb/base_types.py:13-117`); IDF is applied query-side by the
  sparse operators, matching `operators/idf.rs:24-31`.

Scale: embedding runs inside ``mapInPandas``/pandas UDF per partition — no
shuffle, no driver involvement; provider backends that batch HTTP calls
plug into the same shape (one call per Arrow batch).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _md5_bucket(token: str, dim: int) -> int:
    """Same 60-bit md5 truncation as text.md5_long, mod dim — identical in
    Spark (`conv(substring(md5(s),1,15),16,10)`) and DuckDB."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % dim


def _tokenize(text: str | None) -> list[str]:
    return [t for t in (text or "").lower().split() if t]


class EmbeddingFunction:
    """Base: subclasses implement ``__call__(texts) -> list[vector]``."""

    name: str = "base"

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        raise NotImplementedError

    def embed_column(self, text: Column) -> Column:  # dense default
        fn = self

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def embed(s: pd.Series) -> pd.Series:
            return pd.Series(fn(s.tolist()))

        return embed(text)


class HashingEmbeddingFunction(EmbeddingFunction):
    """Deterministic dense embedder: md5 feature-hashing + L2 norm."""

    name = "hashing"

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        out = []
        for text in texts:
            vec = np.zeros(self.dim, dtype=np.float64)
            for tok in _tokenize(text):
                vec[_md5_bucket(tok, self.dim)] += 1.0
            n = math.sqrt(float(np.dot(vec, vec)))
            out.append((vec / n if n else vec).tolist())
        return out


class CharNgramHashingEmbeddingFunction(EmbeddingFunction):
    """Second real local embedder: character-n-gram feature hashing.

    Robust to tokenization differences (typos, agglutination) where the
    word-level hasher is not — the classic fastText-style subword trick.
    Same md5 bucketing, L2-normalized.
    """

    name = "char_ngram_hashing"

    def __init__(self, dim: int = 64, n: int = 3):
        self.dim, self.n = dim, n

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        out = []
        for text in texts:
            vec = np.zeros(self.dim, dtype=np.float64)
            s = " ".join(_tokenize(text))
            for i in range(max(0, len(s) - self.n + 1)):
                vec[_md5_bucket(s[i : i + self.n], self.dim)] += 1.0
            norm = math.sqrt(float(np.dot(vec, vec)))
            out.append((vec / norm if norm else vec).tolist())
        return out


class JLRademacherEmbeddingFunction(EmbeddingFunction):
    """Third real local embedder: Johnson–Lindenstrauss random projection
    of char-n-gram counts with a Rademacher (±1) matrix.

    The projection row for an n-gram is read off the bits of its 60-bit
    md5 — deterministic, no stored matrix, and recomputable in SQL
    (``(md5_long(g) >> j) & 1``), so the driver's oracle can verify the
    whole pandas-UDF embed path by value. Geometry is genuinely distinct
    from tf feature-hashing (dense signed sums; JL preserves inner
    products in expectation), giving recall tests a third regime.
    ``dim <= 60`` (one md5_long supplies the bits).
    """

    name = "jl_rademacher"

    def __init__(self, dim: int = 32, n: int = 3):
        if not 1 <= dim <= 60:
            raise ValueError("jl_rademacher needs 1 <= dim <= 60 (md5_long has 60 bits)")
        self.dim, self.n = dim, n

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        from collections import Counter

        j = np.arange(self.dim, dtype=np.int64)
        out = []
        for text in texts:
            s = " ".join(_tokenize(text))
            grams = Counter(s[i : i + self.n] for i in range(max(0, len(s) - self.n + 1)))
            vec = np.zeros(self.dim, dtype=np.float64)
            for g, c in grams.items():
                h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                vec += float(c) * (((h >> j) & 1) * 2.0 - 1.0)
            norm = math.sqrt(float(np.dot(vec, vec)))
            out.append((vec / norm if norm else vec).tolist())
        return out


class Bm25SparseEmbeddingFunction(EmbeddingFunction):
    """BM25 document-side weights as a SparseVector struct.

    ``w(t) = tf * (k1+1) / (tf + k1 * (1 - b + b * doc_len/avg_len))``
    (reference `bm25_embedding_function.py:94-130`; hashed token space).
    Indices strictly ascending per the SparseVector contract.
    """

    name = "bm25_sparse"

    def __init__(self, k1: float = 1.2, b: float = 0.75, avg_len: float = 256.0, dim: int = 1 << 20):
        self.k1, self.b, self.avg_len, self.dim = k1, b, avg_len, dim

    @classmethod
    def from_corpus_stats(cls, stats: dict, **kwargs) -> "Bm25SparseEmbeddingFunction":
        """Length-normalize against the COLLECTION's real average document
        length (the ``avgdl`` that ``write_bm25_index`` computes at
        compaction) instead of the 256.0 fastembed constant — the constant
        stays the default for provider parity, but a corpus-stats EF scores
        identically (up to the rank-neutral (k1+1) factor) to the inline
        corpus-wide BM25 on the same data."""
        return cls(avg_len=float(stats["avgdl"]), **kwargs)

    def __call__(self, texts: list[str | None]) -> list[dict]:
        out = []
        for text in texts:
            toks = _tokenize(text)
            tf: dict[int, int] = {}
            for t in toks:
                i = _md5_bucket(t, self.dim)
                tf[i] = tf.get(i, 0) + 1
            denom_len = self.k1 * (1 - self.b + self.b * len(toks) / self.avg_len)
            items = sorted(tf.items())
            out.append(
                {
                    "indices": [i for i, _ in items],
                    "values": [c * (self.k1 + 1) / (c + denom_len) for _, c in items],
                }
            )
        return out

    def embed_column(self, text: Column) -> Column:
        fn = self
        schema = T.StructType(
            [
                T.StructField("indices", T.ArrayType(T.LongType())),
                T.StructField("values", T.ArrayType(T.DoubleType())),
            ]
        )

        @F.pandas_udf(schema)
        def embed(s: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(fn(s.tolist()))

        return embed(text)


class _UnavailableProvider(EmbeddingFunction):
    """External-model providers (network / model weights required). The
    class exists so collection configs naming them round-trip; calling one
    here raises with the import that would activate it."""

    requires: str = ""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, texts):
        raise NotImplementedError(
            f"embedding function {self.name!r} needs {self.requires} "
            "(not installed in this environment); use 'hashing' or "
            "'bm25_sparse' for deterministic local embedding"
        )


class _HttpJson:
    """Tiny stdlib POST-JSON helper shared by the HTTP providers — one
    request per Arrow batch, no SDK dependency (the reference wraps vendor
    SDKs; the wire contract is the part that matters)."""

    @staticmethod
    def post(url: str, payload: dict, headers: dict, timeout: float) -> dict:
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            url,
            data=_json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json", **headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return _json.loads(resp.read().decode("utf-8"))


class OpenAIEmbeddingFunction(EmbeddingFunction):
    """OpenAI-compatible `/embeddings` endpoint (the reference's
    `openai_embedding_function.py` wire contract: POST ``{model, input:
    [texts]}`` -> ``{data: [{index, embedding}]}``). ``base_url`` makes it
    work against any compatible server (vLLM, LiteLLM, a mock) — and makes
    the wire path testable offline. Needs an API key (arg or
    ``OPENAI_API_KEY``); refuses cleanly without one."""

    name = "openai"

    def __init__(
        self,
        api_key: str | None = None,
        model_name: str = "text-embedding-3-small",
        base_url: str = "https://api.openai.com/v1",
        dimensions: int | None = None,
        batch_size: int = 2048,
        timeout: float = 60.0,
    ):
        import os

        self.api_key = api_key or os.environ.get("OPENAI_API_KEY")
        self.model_name = model_name
        self.base_url = base_url.rstrip("/")
        self.dimensions = dimensions
        self.batch_size = batch_size
        self.timeout = timeout

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        if not self.api_key:
            raise NotImplementedError(
                "embedding function 'openai' needs an API key "
                "(api_key= or OPENAI_API_KEY)"
            )
        out: list[list[float]] = []
        clean = [t or "" for t in texts]
        for start in range(0, len(clean), self.batch_size):
            payload: dict = {"model": self.model_name, "input": clean[start : start + self.batch_size]}
            if self.dimensions is not None:
                payload["dimensions"] = self.dimensions
            data = _HttpJson.post(
                f"{self.base_url}/embeddings",
                payload,
                {"Authorization": f"Bearer {self.api_key}"},
                self.timeout,
            )
            rows = sorted(data["data"], key=lambda d: d["index"])
            out.extend([float(x) for x in r["embedding"]] for r in rows)
        return out


class _OpenAIWireProvider(OpenAIEmbeddingFunction):
    """Providers whose REST surface is the OpenAI `/embeddings` shape
    (jina_embedding_function.py:106-148, mistral, voyageai): same wire
    code, different default endpoint/model/credential env var."""

    default_base_url = ""
    default_model = ""
    key_env = ""

    def __init__(self, api_key: str | None = None, model_name: str | None = None,
                 base_url: str | None = None, **kwargs):
        import os

        super().__init__(
            api_key=api_key or os.environ.get(self.key_env),
            model_name=model_name or self.default_model,
            base_url=base_url or self.default_base_url,
            **kwargs,
        )

    def __call__(self, texts):
        if not self.api_key:
            raise NotImplementedError(
                f"embedding function {self.name!r} needs an API key "
                f"(api_key= or {self.key_env})"
            )
        return super().__call__(texts)


class JinaEmbeddingFunction(_OpenAIWireProvider):
    name = "jina"
    default_base_url = "https://api.jina.ai/v1"
    default_model = "jina-embeddings-v2-base-en"
    key_env = "JINA_API_KEY"


class MistralEmbeddingFunction(_OpenAIWireProvider):
    name = "mistral"
    default_base_url = "https://api.mistral.ai/v1"
    default_model = "mistral-embed"
    key_env = "MISTRAL_API_KEY"


class VoyageAIEmbeddingFunction(_OpenAIWireProvider):
    name = "voyageai"
    default_base_url = "https://api.voyageai.com/v1"
    default_model = "voyage-large-2"
    key_env = "VOYAGE_API_KEY"


class CohereEmbeddingFunction(EmbeddingFunction):
    """Cohere `/v1/embed` (cohere_embedding_function.py semantics: texts +
    model + input_type='search_document'; response carries ``embeddings``
    as a plain vector list in input order)."""

    name = "cohere"

    def __init__(self, api_key: str | None = None, model_name: str = "embed-english-v3.0",
                 base_url: str = "https://api.cohere.ai/v1",
                 input_type: str = "search_document",
                 batch_size: int = 96, timeout: float = 60.0):
        import os

        self.api_key = api_key or os.environ.get("COHERE_API_KEY")
        self.model_name, self.base_url = model_name, base_url.rstrip("/")
        self.input_type, self.batch_size, self.timeout = input_type, batch_size, timeout

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        if not self.api_key:
            raise NotImplementedError(
                "embedding function 'cohere' needs an API key (api_key= or COHERE_API_KEY)"
            )
        clean = [t or "" for t in texts]
        out: list[list[float]] = []
        for start in range(0, len(clean), self.batch_size):
            data = _HttpJson.post(
                f"{self.base_url}/embed",
                {"texts": clean[start : start + self.batch_size],
                 "model": self.model_name, "input_type": self.input_type},
                {"Authorization": f"Bearer {self.api_key}"},
                self.timeout,
            )
            out.extend([float(x) for x in v] for v in data["embeddings"])
        return out


class OllamaEmbeddingFunction(EmbeddingFunction):
    """Ollama `/api/embed` (ollama_embedding_function.py: POST {model,
    input} -> {embeddings: [[...]]}); keyless, local-server use case."""

    name = "ollama"

    def __init__(self, url: str | None = None, model_name: str = "chroma/all-minilm-l6-v2-f32",
                 batch_size: int = 256, timeout: float = 60.0):
        self.url = (url or "").rstrip("/")
        self.model_name, self.batch_size, self.timeout = model_name, batch_size, timeout

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        if not self.url:
            raise NotImplementedError(
                "embedding function 'ollama' needs url= of a running ollama server"
            )
        clean = [t or "" for t in texts]
        out: list[list[float]] = []
        for start in range(0, len(clean), self.batch_size):
            data = _HttpJson.post(
                f"{self.url}/api/embed",
                {"model": self.model_name, "input": clean[start : start + self.batch_size]},
                {}, self.timeout,
            )
            out.extend([float(x) for x in v] for v in data["embeddings"])
        return out


class ONNXMiniLM_L6_V2(EmbeddingFunction):
    """all-MiniLM-L6-v2 (384-d) through onnxruntime — the reference's
    default local embedding function
    (`chromadb/utils/embedding_functions/onnx_mini_lm_l6_v2.py`): tokenize,
    run the ONNX encoder, attention-masked mean pooling, L2 normalize.

    Activates ONLY when the runtime deps (``onnxruntime`` + ``tokenizers``)
    and the model files are present — probed lazily, never at import, so
    configs naming this EF round-trip in environments without them
    (``available()`` reports which way). No network: ``model_path`` must
    hold ``model.onnx`` + ``tokenizer.json`` (the contents of the
    reference's downloaded archive); the reference fetches that archive on
    first use, which a sandboxed deployment pre-stages instead.
    """

    name = "onnx_mini_lm_l6_v2"

    def __init__(self, model_path: str | None = None, max_tokens: int = 256, **kwargs):
        self.model_path = model_path
        self.max_tokens = max_tokens
        self.kwargs = kwargs
        self._session = None
        self._tokenizer = None

    @staticmethod
    def available() -> bool:
        try:
            import onnxruntime  # noqa: F401
            import tokenizers  # noqa: F401
        except ImportError:
            return False
        return True

    def _ensure_loaded(self) -> None:
        if self._session is not None:
            return
        import os

        if not self.available():
            raise NotImplementedError(
                "embedding function 'onnx_mini_lm_l6_v2' needs onnxruntime + "
                "tokenizers (not installed in this environment); use 'hashing' "
                "or 'bm25_sparse' for deterministic local embedding"
            )
        import onnxruntime
        from tokenizers import Tokenizer

        if self.model_path is None or not os.path.isdir(self.model_path):
            raise NotImplementedError(
                "embedding function 'onnx_mini_lm_l6_v2' needs model_path "
                "pointing at a directory with model.onnx + tokenizer.json "
                "(pre-stage the all-MiniLM-L6-v2 ONNX export; this "
                "environment has no network to download it)"
            )
        self._tokenizer = Tokenizer.from_file(os.path.join(self.model_path, "tokenizer.json"))
        self._tokenizer.enable_truncation(max_length=self.max_tokens)
        self._tokenizer.enable_padding(pad_id=0, pad_token="[PAD]")
        self._session = onnxruntime.InferenceSession(
            os.path.join(self.model_path, "model.onnx"),
            providers=["CPUExecutionProvider"],
        )

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        self._ensure_loaded()
        enc = self._tokenizer.encode_batch([t or "" for t in texts])
        ids = np.array([e.ids for e in enc], dtype=np.int64)
        mask = np.array([e.attention_mask for e in enc], dtype=np.int64)
        (hidden,) = self._session.run(
            None,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "token_type_ids": np.zeros_like(ids),
            },
        )[:1]
        m = mask[:, :, None].astype(np.float64)
        pooled = (hidden * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
        norms = np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-12)
        return (pooled / norms).tolist()


class SentenceTransformerEmbeddingFunction(_UnavailableProvider):
    name, requires = "sentence_transformer", "sentence-transformers"


class HuggingFaceEmbeddingServerFunction(EmbeddingFunction):
    """Text-Embeddings-Inference server (the reference's
    `huggingface_embedding_server.py` contract: POST ``{"inputs": [texts]}``
    to the server's ``/embed`` route, response is the vector list). Point
    ``url`` at any running TEI instance; refuses cleanly without one."""

    name = "huggingface_server"

    def __init__(self, url: str | None = None, api_key: str | None = None,
                 batch_size: int = 256, timeout: float = 60.0):
        self.url = url
        self.api_key = api_key
        self.batch_size = batch_size
        self.timeout = timeout

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        if not self.url:
            raise NotImplementedError(
                "embedding function 'huggingface_server' needs url= of a "
                "running text-embeddings-inference endpoint"
            )
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        clean = [t or "" for t in texts]
        out: list[list[float]] = []
        for start in range(0, len(clean), self.batch_size):
            vecs = _HttpJson.post(
                self.url, {"inputs": clean[start : start + self.batch_size]},
                headers, self.timeout,
            )
            out.extend([float(x) for x in v] for v in vecs)
        return out


class GoogleGenerativeAiEmbeddingFunction(EmbeddingFunction):
    """Gemini embedding REST surface (google_embedding_function.py
    semantics over the public ``:batchEmbedContents`` route instead of the
    SDK): POST ``{requests: [{model, content: {parts: [{text}]}}]}`` ->
    ``{embeddings: [{values: [...]}]}``."""

    name = "google_generative_ai"

    def __init__(self, api_key: str | None = None, model_name: str = "gemini-embedding-001",
                 base_url: str = "https://generativelanguage.googleapis.com/v1beta",
                 task_type: str | None = None, batch_size: int = 100, timeout: float = 60.0):
        import os

        self.api_key = api_key or os.environ.get("GOOGLE_API_KEY")
        self.model_name, self.base_url = model_name, base_url.rstrip("/")
        self.task_type, self.batch_size, self.timeout = task_type, batch_size, timeout

    def __call__(self, texts: list[str | None]) -> list[list[float]]:
        if not self.api_key:
            raise NotImplementedError(
                "embedding function 'google_generative_ai' needs an API key "
                "(api_key= or GOOGLE_API_KEY)"
            )
        clean = [t or "" for t in texts]
        out: list[list[float]] = []
        for start in range(0, len(clean), self.batch_size):
            req = {
                "requests": [
                    {
                        "model": f"models/{self.model_name}",
                        "content": {"parts": [{"text": t}]},
                        **({"taskType": self.task_type} if self.task_type else {}),
                    }
                    for t in clean[start : start + self.batch_size]
                ]
            }
            data = _HttpJson.post(
                f"{self.base_url}/models/{self.model_name}:batchEmbedContents",
                req, {"x-goog-api-key": self.api_key}, self.timeout,
            )
            out.extend([float(x) for x in e["values"]] for e in data["embeddings"])
        return out


class InstructorEmbeddingFunction(_UnavailableProvider):
    name, requires = "instructor", "InstructorEmbedding + model weights"


known_embedding_functions: dict[str, Callable[..., EmbeddingFunction]] = {
    c.name: c
    for c in (
        HashingEmbeddingFunction,
        CharNgramHashingEmbeddingFunction,
        JLRademacherEmbeddingFunction,
        Bm25SparseEmbeddingFunction,
        OpenAIEmbeddingFunction,
        CohereEmbeddingFunction,
        ONNXMiniLM_L6_V2,
        SentenceTransformerEmbeddingFunction,
        HuggingFaceEmbeddingServerFunction,
        JinaEmbeddingFunction,
        VoyageAIEmbeddingFunction,
        GoogleGenerativeAiEmbeddingFunction,
        MistralEmbeddingFunction,
        InstructorEmbeddingFunction,
        OllamaEmbeddingFunction,
    )
}


def register_embedding_function(cls: type[EmbeddingFunction]) -> type[EmbeddingFunction]:
    known_embedding_functions[cls.name] = cls
    return cls


def get_embedding_function(name: str, **kwargs) -> EmbeddingFunction:
    if name not in known_embedding_functions:
        raise KeyError(f"unknown embedding function {name!r}; known: {sorted(known_embedding_functions)}")
    return known_embedding_functions[name](**kwargs)


def embed_records(
    df: DataFrame, ef: EmbeddingFunction, text_col: str = "document", out_col: str = "embedding"
) -> DataFrame:
    """Attach ``out_col`` = ef(text_col) via the Arrow-batched UDF path."""
    return df.withColumn(out_col, ef.embed_column(F.col(text_col)))


# ---------------------------------------------------------------------------
# DuckDB twin of HashingEmbeddingFunction, in *sparse* form: (id, bucket, w)
# plus the per-doc L2 norm — enough to compute any dot/cosine against
# another hashed vector without materializing dense arrays in SQL.
# ---------------------------------------------------------------------------


def hashing_weights_sql(docs_sql: str, dim: int, text_col: str = "document", id_col: str = "id") -> str:
    from .text import md5_long_sql, tokens_sql

    toks = tokens_sql(f'"{text_col}"')
    return f"""
SELECT id, b, CAST(count(*) AS DOUBLE) AS w
FROM (
  SELECT "{id_col}" AS id, {md5_long_sql("tok")} % {dim} AS b
  FROM (SELECT "{id_col}", unnest({toks}) AS tok FROM ({docs_sql}))
)
GROUP BY id, b"""
