"""Embedding-function registry: determinism, normalization, SparseVector
contract, provider stubs, and the Arrow embed path."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_spark.functions.embedding import (
    Bm25SparseEmbeddingFunction,
    EmbeddingFunction,
    HashingEmbeddingFunction,
    embed_records,
    get_embedding_function,
    known_embedding_functions,
    register_embedding_function,
)


def test_hashing_deterministic_and_normalized():
    ef = HashingEmbeddingFunction(dim=16)
    v1, v2 = ef(["hello world hello"]), ef(["hello world hello"])
    assert v1 == v2 and len(v1[0]) == 16
    assert math.isclose(float(np.linalg.norm(v1[0])), 1.0, rel_tol=1e-12)
    assert ef([""])[0] == [0.0] * 16 and ef([None])[0] == [0.0] * 16


def test_hashing_tf_weighting():
    ef = HashingEmbeddingFunction(dim=64)
    (va,), (vb,) = ef(["aa bb"]), ef(["aa aa bb"])
    # repeated token shifts weight toward its bucket
    assert not np.allclose(va, vb)


def test_bm25_sparse_contract():
    ef = Bm25SparseEmbeddingFunction(dim=1 << 12)
    (sv,) = ef(["one two two three three three"])
    idx, vals = sv["indices"], sv["values"]
    assert idx == sorted(idx) and len(idx) == len(set(idx)) == 3
    assert all(v > 0 for v in vals)
    # higher tf -> higher weight, saturating (BM25 k1 cap)
    by_tf = dict(zip(idx, vals))
    w1 = by_tf[[i for i in idx if math.isclose(min(vals), by_tf[i])][0]]
    assert max(vals) < ef.k1 + 1  # asymptotic bound tf*(k1+1)/(tf+...) < k1+1
    assert w1 == min(vals)


def test_registry_and_stubs():
    assert "hashing" in known_embedding_functions
    with pytest.raises(KeyError):
        get_embedding_function("nope")
    for name in (
        "openai", "cohere", "onnx_mini_lm_l6_v2", "sentence_transformer",
        "jina", "voyageai", "google_generative_ai", "mistral", "instructor",
    ):
        with pytest.raises(NotImplementedError, match="not installed|needs"):
            get_embedding_function(name)(["x"])

    @register_embedding_function
    class Custom(EmbeddingFunction):
        name = "custom_test"

        def __call__(self, texts):
            return [[1.0] for _ in texts]

    assert get_embedding_function("custom_test")(["a"]) == [[1.0]]


def test_char_ngram_hashing_subword_robustness():
    from chroma_spark.functions.embedding import CharNgramHashingEmbeddingFunction

    import numpy as np

    ef = CharNgramHashingEmbeddingFunction(dim=64, n=3)
    a, b, c = ef(["sparkly table", "sparkly tables", "completely different thing"])
    assert abs(float(np.dot(a, a)) - 1.0) < 1e-9  # normalized
    # subword overlap: the near-typo pair is far more similar than unrelated
    assert float(np.dot(a, b)) > 0.8 > float(np.dot(a, c))
    assert ef([""]) == [[0.0] * 64] and ef([None]) == [[0.0] * 64]


def test_embed_records_arrow_path_matches_local(spark):
    ef = HashingEmbeddingFunction(dim=8)
    df = spark.createDataFrame([("1", "alpha beta"), ("2", "beta gamma beta")], ["id", "document"])
    out = {r.id: r.embedding for r in embed_records(df, ef).collect()}
    local = dict(zip(["1", "2"], ef(["alpha beta", "beta gamma beta"])))
    for i in local:
        assert np.allclose(out[i], local[i])


def test_jl_rademacher_deterministic_unit_norm_distinct_geometry():
    from chroma_spark.functions.embedding import JLRademacherEmbeddingFunction

    ef = JLRademacherEmbeddingFunction(dim=32, n=3)
    a1, a2 = ef(["the quick brown fox"])[0], ef(["the quick brown fox"])[0]
    assert a1 == a2 and len(a1) == 32
    assert math.isclose(sum(x * x for x in a1), 1.0, rel_tol=1e-9)
    # subword sensitivity: a typo shares most grams -> closer than a
    # different sentence (the JL geometry preserves n-gram overlap)
    b = ef(["the quikc brown fox"])[0]
    c = ef(["entirely unrelated words here"])[0]
    dot = lambda u, v: sum(x * y for x, y in zip(u, v))  # noqa: E731
    assert dot(a1, b) > dot(a1, c)
    assert ef([""])[0] == [0.0] * 32 and ef([None])[0] == [0.0] * 32
    with pytest.raises(ValueError, match="60"):
        JLRademacherEmbeddingFunction(dim=61)
    assert "jl_rademacher" in known_embedding_functions


def test_bm25_ef_corpus_avgdl_matches_inline_scoring(spark, tmp_path):
    """An EF built from write_bm25_index's collection stats scores exactly
    like the inline corpus-wide bm25_topk (up to the rank-neutral (k1+1)
    factor fastembed puts in the numerator): same length normalization,
    same IDF — closing the 256.0-constant gap (VERDICT r2 #7)."""
    import math as m

    from chroma_spark.functions.embedding import _md5_bucket
    from chroma_spark.operators.sparse import (
        bm25_topk,
        doc_frequency,
        write_bm25_index,
    )
    from chroma_spark.registry import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select(
        F.col("doc_id").alias("id"), F.col("text").alias("document")
    )
    stats = write_bm25_index(docs, str(tmp_path / "tf"), n_buckets=8)
    ef = Bm25SparseEmbeddingFunction.from_corpus_stats(stats)
    assert ef.avg_len == stats["avgdl"] != 256.0

    terms = ["spark", "table", "merge"]
    inline = {r.id: r.score for r in bm25_topk(docs, terms, k=15).collect()}

    n_docs = float(stats["n_docs"])
    dfreq = {
        r.term: float(r.df)
        for r in doc_frequency(docs).filter(F.col("term").isin(terms)).collect()
    }
    idf = {
        t: m.log((n_docs - min(dfreq.get(t, 0.0), n_docs) + 0.5) / (min(dfreq.get(t, 0.0), n_docs) + 0.5) + 1.0)
        for t in terms
    }
    buckets = {_md5_bucket(t, ef.dim): t for t in terms}
    sv_rows = embed_records(docs, ef, out_col="sv").select("id", "sv").collect()
    scores = {}
    for r in sv_rows:
        s = 0.0
        for i, v in zip(r.sv["indices"], r.sv["values"]):
            if i in buckets:
                s += idf[buckets[i]] * v / (ef.k1 + 1)
        if s > 0:
            scores[r.id] = s
    for rid, sc in inline.items():
        assert scores.get(rid) == pytest.approx(sc, abs=1e-6), rid


def test_sparse_embed_column(spark):
    ef = Bm25SparseEmbeddingFunction(dim=1 << 12)
    df = spark.createDataFrame([("1", "a b a")], ["id", "document"])
    row = df.withColumn("sv", ef.embed_column(F.col("document"))).first()
    assert row.sv.indices == sorted(row.sv.indices) and len(row.sv.indices) == 2


def test_onnx_minilm_probe_both_ways():
    """The ONNX MiniLM path activates when its runtime deps + model files
    exist and refuses cleanly otherwise — green in BOTH environments."""
    from chroma_spark.functions.embedding import ONNXMiniLM_L6_V2

    ef = ONNXMiniLM_L6_V2(model_path=None)
    if not ONNXMiniLM_L6_V2.available():
        with pytest.raises(NotImplementedError, match="onnxruntime"):
            ef(["hello"])
        return  # deps absent: clean refusal IS the contract here
    # deps present but no model files: still a clean, specific refusal
    with pytest.raises(NotImplementedError, match="model_path"):
        ef(["hello"])
    import os

    mp = os.environ.get("SPARK_GRAFT_MINILM_PATH")
    if not mp:
        pytest.skip("onnxruntime present but no pre-staged model files")
    vecs = ONNXMiniLM_L6_V2(model_path=mp)(["hello world", "second text"])
    assert len(vecs) == 2 and len(vecs[0]) == 384
    assert abs(sum(x * x for x in vecs[0]) - 1.0) < 1e-6


def test_http_providers_against_local_mock():
    """OpenAI-compatible + TEI providers speak their wire contracts,
    verified against an in-process localhost server (no network)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from chroma_spark.functions.embedding import (
        HuggingFaceEmbeddingServerFunction,
        OpenAIEmbeddingFunction,
    )

    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            seen[self.path] = (dict(self.headers), body)
            if self.path == "/v1/embeddings":
                texts = body["input"]
                out = {"data": [
                    # reversed order on purpose: the client must sort by index
                    {"index": i, "embedding": [float(len(t)), float(i)]}
                    for i in reversed(range(len(texts)))
                    for t in [texts[i]]
                ]}
            elif "cohere" in self.path:  # cohere /v1/embed
                out = {"embeddings": [[float(len(t)), 7.0] for t in body["texts"]]}
            elif "batchEmbedContents" in self.path:  # gemini
                out = {"embeddings": [
                    {"values": [float(len(r["content"]["parts"][0]["text"])), 3.0]}
                    for r in body["requests"]
                ]}
            elif self.path.endswith("/api/embed"):  # ollama
                out = {"embeddings": [[float(len(t)), 7.0] for t in body["input"]]}
            else:  # TEI /embed
                out = [[float(len(t)), 9.0] for t in body["inputs"]]
            payload = _json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        oai = OpenAIEmbeddingFunction(
            api_key="test-key", base_url=f"http://127.0.0.1:{port}/v1",
            model_name="text-embedding-3-small",
        )
        vecs = oai(["ab", "xyz", None])
        assert vecs == [[2.0, 0.0], [3.0, 1.0], [0.0, 2.0]]  # index-sorted
        hdrs, body = seen["/v1/embeddings"]
        assert hdrs["Authorization"] == "Bearer test-key"
        assert body == {"model": "text-embedding-3-small", "input": ["ab", "xyz", ""]}

        tei = HuggingFaceEmbeddingServerFunction(url=f"http://127.0.0.1:{port}/embed")
        assert tei(["hello", "hi"]) == [[5.0, 9.0], [2.0, 9.0]]
        assert seen["/embed"][1] == {"inputs": ["hello", "hi"]}

        from chroma_spark.functions.embedding import (
            CohereEmbeddingFunction,
            JinaEmbeddingFunction,
            OllamaEmbeddingFunction,
        )

        co = CohereEmbeddingFunction(api_key="k2", base_url=f"http://127.0.0.1:{port}/v1cohere")
        assert co(["abcd"]) == [[4.0, 7.0]]
        assert seen["/v1cohere/embed"][1] == {
            "texts": ["abcd"], "model": "embed-english-v3.0",
            "input_type": "search_document",
        }
        ol = OllamaEmbeddingFunction(url=f"http://127.0.0.1:{port}/ollama")
        assert ol(["ab"]) == [[2.0, 7.0]]
        assert seen["/ollama/api/embed"][1]["input"] == ["ab"]
        # the OpenAI-wire family shares the proven wire path; jina as probe
        ji = JinaEmbeddingFunction(api_key="k3", base_url=f"http://127.0.0.1:{port}/v1")
        assert ji(["abc"]) == [[3.0, 0.0]]
        assert seen["/v1/embeddings"][1]["model"] == "jina-embeddings-v2-base-en"

        from chroma_spark.functions.embedding import GoogleGenerativeAiEmbeddingFunction

        gg = GoogleGenerativeAiEmbeddingFunction(
            api_key="k4", base_url=f"http://127.0.0.1:{port}/v1beta"
        )
        assert gg(["abcde"]) == [[5.0, 3.0]]
        ghdrs, gbody = seen["/v1beta/models/gemini-embedding-001:batchEmbedContents"]
        assert {k.lower(): v for k, v in ghdrs.items()}["x-goog-api-key"] == "k4"
        assert gbody["requests"][0]["content"]["parts"] == [{"text": "abcde"}]
    finally:
        srv.shutdown()

    # no-credential refusals stay clean
    with pytest.raises(NotImplementedError, match="needs an API key"):
        OpenAIEmbeddingFunction(api_key=None, base_url="http://x")(["a"])
    with pytest.raises(NotImplementedError, match="needs url"):
        HuggingFaceEmbeddingServerFunction()(["a"])
