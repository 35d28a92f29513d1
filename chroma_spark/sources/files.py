"""File-format document sources: JSONL / CSV / text files -> the canonical
record frame that feeds ``Collection.add_records`` (and, in streaming form,
the compactor's ingest loop).

The reference ingests exclusively through the client ``add()`` API
(`chromadb/api/models/Collection.py:81`), so every bulk loader users write
is a file-reader + batching loop. Here that loop IS the engine: a reader
returns one distributed DataFrame in the ``add_records`` column contract
(``id`` string, optional ``document`` / ``embedding array<float>`` /
``uri``, everything else metadata), so 100 TB of JSONL shards ingest as ONE
distributed write — no driver-side batching, no row materialization.

Scale notes (the difference between a demo loader and a 100-TB one):

- **Pass an explicit schema for JSONL/CSV at scale.** Without one, Spark
  runs a full inference scan of the input before the real read — doubling
  IO. All readers accept ``schema`` (DDL string or StructType) and the
  streaming reader requires it.
- **Compression beats splittability tradeoffs.** ``.jsonl.gz`` shards are
  non-splittable: one task per file, so parallelism = file count. Prefer
  many ~100 MB-1 GB shards (the Common Crawl / Dolma layout) or zstd
  parquet. The readers take directories/globs, so sharded layouts are the
  default shape.
- **Line mode never loads a whole file per row; wholetext does.** Use
  ``whole_files=True`` only for corpora of small files, and expect one
  task per file.
- **Content-addressed ids dedup at ingest.** When no id column exists,
  ids are ``sha256(document)`` and exact-duplicate documents collapse to
  one row (a hash ``dropDuplicates`` — the same shuffle shape as
  ``dedup.exact_duplicates``). That is a feature (content-addressed
  ingest) and is documented per reader; pass ``id_col`` to keep duplicate
  texts as distinct records.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .collection import CollectionError

RESERVED = ("id", "embedding", "document", "uri")


def _canonicalize(
    df: DataFrame,
    *,
    id_col: str | None,
    document_col: str | None,
    embedding_col: str | None = None,
    uri_col: str | None = None,
    metadata_cols: list[str] | None = None,
    embedding_delimiter: str | None = None,
) -> DataFrame:
    """Rename/cast a raw file frame into the ``add_records`` contract.

    ``metadata_cols=None`` keeps every non-canonical source column as
    metadata (typed by its Spark type); pass a list to keep only those.
    With no ``id_col``, ids are ``sha256(document)`` and exact-duplicate
    documents are dropped (content-addressed ingest).
    """
    for c in (id_col, document_col, embedding_col, uri_col, *(metadata_cols or [])):
        if c is not None and c not in df.columns:
            raise CollectionError(f"column {c!r} not in input: {df.columns}")
    out = []
    if id_col is not None:
        out.append(F.col(id_col).cast("string").alias("id"))
    elif document_col is not None:
        out.append(F.sha2(F.coalesce(F.col(document_col), F.lit("")), 256).alias("id"))
    else:
        raise CollectionError("need id_col or document_col to form record ids")
    if document_col is not None:
        out.append(F.col(document_col).cast("string").alias("document"))
    if embedding_col is not None:
        e = F.col(embedding_col)
        if embedding_delimiter is not None:
            # CSV-style "0.1,0.2,..." string column
            e = F.split(e.cast("string"), embedding_delimiter)
        out.append(e.cast("array<float>").alias("embedding"))
    if uri_col is not None:
        out.append(F.col(uri_col).cast("string").alias("uri"))
    named = {id_col, document_col, embedding_col, uri_col}
    meta = metadata_cols if metadata_cols is not None else [
        c for c in df.columns if c not in named and c not in RESERVED
    ]
    out.extend(F.col(c) for c in meta)
    res = df.select(*out)
    if id_col is None:
        # Which duplicate's METADATA survives is arbitrary (their documents
        # are byte-identical by construction); callers needing a
        # deterministic winner should carry an id column instead.
        res = res.dropDuplicates(["id"])
    return res


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: Any | None = None,
    document_col: str = "text",
    id_col: str | None = None,
    embedding_col: str | None = None,
    uri_col: str | None = None,
    metadata_cols: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JSONL corpus (dir / glob / file, ``.gz``/``.zst`` transparent)
    into the record contract. One JSON object per line (the Dolma / Common
    Crawl / HF-datasets export shape); ``multiLine`` JSON is deliberately
    not the default — it is non-splittable per file.

    At scale pass ``schema``: inference costs a second full scan.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _canonicalize(
        reader.json(path),
        id_col=id_col,
        document_col=document_col,
        embedding_col=embedding_col,
        uri_col=uri_col,
        metadata_cols=metadata_cols,
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: Any | None = None,
    header: bool = True,
    document_col: str = "text",
    id_col: str | None = None,
    embedding_col: str | None = None,
    embedding_delimiter: str = ";",
    uri_col: str | None = None,
    metadata_cols: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a CSV corpus into the record contract. Embeddings, if present,
    are a delimited string column (``embedding_delimiter``-separated floats)
    since CSV has no array type. Multi-line quoted fields need
    ``options={"multiLine": "true"}`` — which makes files non-splittable;
    prefer JSONL for document bodies at scale."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _canonicalize(
        reader.csv(path),
        id_col=id_col,
        document_col=document_col,
        embedding_col=embedding_col,
        uri_col=uri_col,
        metadata_cols=metadata_cols,
        embedding_delimiter=embedding_delimiter,
    )


def read_documents_text(
    spark: SparkSession,
    path: str,
    *,
    whole_files: bool = False,
    min_chars: int = 1,
) -> DataFrame:
    """Read raw text into the record contract: one record per line (default)
    or per file (``whole_files=True``). ``uri`` is the source file; ids are
    content-addressed (sha256 of the text — exact-duplicate lines/files
    collapse, see module docstring), except whole-file mode where the file
    path itself is the natural unique id.

    Line mode splits large files across tasks (TextInputFormat line
    splitting), so a single 1 TB text file still parallelizes; whole-file
    mode is one task AND one memory-resident string per file — small-file
    corpora only."""
    df = spark.read.text(path, wholetext=whole_files).withColumn(
        "__file", F.input_file_name()
    )
    df = df.filter(F.length("value") >= int(min_chars))
    return _canonicalize(
        df,
        id_col="__file" if whole_files else None,
        document_col="value",
        uri_col="__file",
        metadata_cols=[],
    )


def stream_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: Any,
    *,
    document_col: str = "text",
    id_col: str | None = None,
    embedding_col: str | None = None,
    uri_col: str | None = None,
    metadata_cols: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_documents_jsonl`: watch a directory for
    new JSONL shards (``readStream``; schema REQUIRED — Structured Streaming
    never infers). Feed the result to ``Collection.ingest_stream`` or any
    ``foreachBatch(add_records)`` loop; pair with
    ``option("maxFilesPerTrigger", n)`` for bounded micro-batches.

    Content-addressed ids (no ``id_col``) dedup only WITHIN a micro-batch
    here — cross-batch exact dedup belongs to the streaming dedup operator
    (``streaming/dedup.py``) with a watermark, or to UPSERT ingest."""
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _canonicalize(
        reader.json(path),
        id_col=id_col,
        document_col=document_col,
        embedding_col=embedding_col,
        uri_col=uri_col,
        metadata_cols=metadata_cols,
    )


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """Export a record frame (or any query result) as sharded JSONL — the
    interchange sink for downstream tokenizer/training jobs. One shard per
    task; ``repartition(n)`` upstream to control shard count/size."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
