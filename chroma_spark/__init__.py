"""chroma_spark — a PySpark-native vector & hybrid-search analytics engine.

Re-implements the query and data-processing capabilities of
chroma-core/chroma (collections of records with dense/sparse embeddings,
documents, typed metadata; Where filter grammar; exact + approximate KNN;
hybrid-search rank expressions; group-by-top-k; pagination; the
add/update/upsert/delete/fork write surface) as idiomatic Spark DataFrame
plans — NOT a port of the reference's SQLite/hnswlib/Rust machinery.

Layout:
  where.py               Where / WhereDocument grammar -> Spark Column
                         (+ a DuckDB-SQL twin compiler used by the oracle)
  functions/distance.py  l2 / cosine / ip column expressions
  functions/text.py      tokenization, n-grams, deterministic hashing
  operators/knn.py       exact brute-force batch KNN (scalable 2-stage top-k)
  operators/rank.py      rank-expression calculus ($knn/$val/arith/Rrf)
  operators/group_by.py  ranked group-by MinK/MaxK
  operators/sparse.py    sparse dot-product top-k, BM25 + IDF
  operators/dedup.py     exact / minhash-LSH / simhash / jaccard / embedding
  operators/textstats.py language-id, quality scores, token counts
  operators/sampling.py  deterministic hash sampling + proportion mixing
  operators/decontam.py  train/eval n-gram decontamination
  operators/multimodal.py binary media columns (Arrow-batched codecs)
  sources/collection.py  collection storage (parquet + catalog + WAL log)
  sources/log.py         WAL materialization (CDC net-effect merge)
  ann/                   IVF (SPANN-style) ANN + sign-bit/SQ4/PQ tiers
  streaming/             Structured Streaming compactor, windows, builders
  quota.py               frontend quota enforcement + rate limiting
  auth.py                token authn + simple-RBAC authz middleware
  api.py                 Client / Collection public API
  sources/files.py       JSONL/CSV/text ingestion + streaming reader + sink
  server.py              HTTP facade of the v2 REST API (Flask)
  http_client.py         stdlib HttpClient for the facade
"""

__version__ = "0.1.0"
