"""Multimodal (image/audio/video) column operators.

Beyond the reference's text surface (SURVEY §7 phase 7): a 100-TB training
pipeline carries media as opaque ``BINARY`` columns plus typed metadata, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
pandas UDFs (``mapInPandas``). The reference's embedding-function registry
(`chromadb/utils/embedding_functions/`, ~30 providers incl. image models
such as OpenCLIP) is the analogous pluggable boundary.

The image/audio codecs are NOT in this container, so the decode itself is a
deterministic fake (`_fake_*_meta`) derived purely from the payload byte
length — but everything Spark-side is real: the binary column, the Arrow
batch transfer, the 1->N row fan-out for frame sampling, the schema
contracts. Swapping `_fake_image_meta` for PIL is a one-function change
(see `decode_images(use_real_decoder=True)` which raises
``NotImplementedError`` until the codec libs exist).

Scale design notes:
- mapInPandas keeps media payloads inside Arrow record batches; no Python
  row-at-a-time boxing. Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — at 100 TB set it so
  (batch_rows x median_asset_bytes) fits executor memory (e.g. 64 rows of
  8 MB images).
- frame sampling fans 1 video row out to n rows *within* a partition — no
  shuffle; downstream per-frame work inherits the partitioning.
- feature extraction emits fixed-width ``ARRAY<FLOAT>`` ready for the KNN /
  IVF operators (ann/) — media similarity search reuses the dense path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
    ]
)

_MIME = {"image": "image/x-fake", "audio": "audio/x-fake", "video": "video/x-fake"}


def synthesize_assets(docs: DataFrame, id_col: str = "id", text_col: str = "document") -> DataFrame:
    """Deterministic fake media table ``(id, modality, mime, data BINARY)``.

    The payload is the document's UTF-8 bytes; the modality cycles by id.
    This stands in for a real asset store (S3 URIs + fetched bytes) so the
    binary-column plumbing is exercised end-to-end on the driver testdata.
    """
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    mime_map = F.create_map(*[F.lit(x) for kv in _MIME.items() for x in kv])
    return docs.select(
        F.col(id_col).cast("long").alias("id"),
        modality.alias("modality"),
        mime_map[modality].alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
    )


def synthesize_assets_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`synthesize_assets` (oracle input)."""
    return f"""
SELECT CAST(id AS BIGINT) AS id,
       (['image','audio','video'])[CAST(id % 3 AS INTEGER) + 1] AS modality,
       (['image/x-fake','audio/x-fake','video/x-fake'])[CAST(id % 3 AS INTEGER) + 1] AS mime,
       encode(document) AS data
FROM ({docs_sql})"""


# ---------------------------------------------------------------------------
# Deterministic fake decoders (length-derived). The *values* are arbitrary
# but fixed: they give each asset a plausible, reproducible geometry so the
# resize / frame-sample operators have real inputs, and they are simple
# enough to express in the DuckDB oracle (pure functions of octet_length).
# ---------------------------------------------------------------------------


def _fake_image_geom(nbytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    width = 16 + nbytes % 240
    height = 16 + (nbytes * 7) % 240
    return width, height


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("nbytes", T.LongType()),
        T.StructField("width", T.LongType()),  # image/video; 0 for audio
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),  # audio; 0 otherwise
        T.StructField("duration_ms", T.LongType()),  # audio/video; 0 for image
        T.StructField("n_frames", T.LongType()),  # video; 0 otherwise
    ]
)

_SAMPLE_RATE = 16_000
_FPS = 25


def decode_assets(assets: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode media headers -> typed metadata rows (Arrow-batched).

    ``use_real_decoder=True`` is the hook for PIL / libsndfile / pyav —
    unavailable in this container, so it raises ``NotImplementedError``
    inside the UDF (per-batch, on executors) to keep the driver-side plan
    construction importable everywhere.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise NotImplementedError(
                    "real media codecs (PIL/libsndfile/pyav) are not installed; "
                    "deterministic fake decode is the supported path here"
                )
            n = pdf["data"].map(len).to_numpy(dtype=np.int64)
            modality = pdf["modality"].to_numpy()
            width, height = _fake_image_geom(n)
            is_img = modality == "image"
            is_aud = modality == "audio"
            is_vid = modality == "video"
            n_frames = np.where(is_vid, 1 + n % 30, 0)
            duration = np.where(
                is_aud,
                n * 4 * 1000 // _SAMPLE_RATE,
                np.where(is_vid, n_frames * 1000 // _FPS, 0),
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "modality": modality,
                    "nbytes": n,
                    "width": np.where(is_aud, 0, width),
                    "height": np.where(is_aud, 0, height),
                    "channels": np.where(is_aud, 1, 3),
                    "sample_rate": np.where(is_aud, _SAMPLE_RATE, 0),
                    "duration_ms": duration,
                    "n_frames": n_frames,
                }
            )

    return assets.mapInPandas(decode, DECODED_META_SCHEMA)


def decode_assets_sql(assets_sql: str) -> str:
    """DuckDB twin of the fake decode (same closed-form formulas)."""
    return f"""
SELECT id, modality, n AS nbytes,
       CASE WHEN modality = 'audio' THEN 0 ELSE 16 + n % 240 END AS width,
       CASE WHEN modality = 'audio' THEN 0 ELSE 16 + (n * 7) % 240 END AS height,
       CASE WHEN modality = 'audio' THEN 1 ELSE 3 END AS channels,
       CASE WHEN modality = 'audio' THEN {_SAMPLE_RATE} ELSE 0 END AS sample_rate,
       CASE WHEN modality = 'audio' THEN n * 4 * 1000 // {_SAMPLE_RATE}
            WHEN modality = 'video' THEN (1 + n % 30) * 1000 // {_FPS}
            ELSE 0 END AS duration_ms,
       CASE WHEN modality = 'video' THEN 1 + n % 30 ELSE 0 END AS n_frames
FROM (SELECT id, modality, CAST(octet_length(data) AS BIGINT) AS n FROM ({assets_sql}))"""


# ---------------------------------------------------------------------------
# Resize (geometry-only stub; payload untouched)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
    ]
)


def resize_images(assets: DataFrame, max_dim: int, use_real_decoder: bool = False) -> DataFrame:
    """Aspect-preserving resize plan for image assets (Arrow-batched).

    Computes the target geometry exactly as a PIL ``thumbnail`` pass would
    (floor scaling, never upscale); the pixel resample itself is the stubbed
    step. Non-image rows are filtered out before the UDF so the media bytes
    of other modalities never cross the Arrow boundary.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise NotImplementedError("PIL not installed; geometry-only resize stub")
            n = pdf["data"].map(len).to_numpy(dtype=np.int64)
            width, height = _fake_image_geom(n)
            long_side = np.maximum(width, height)
            scale = np.minimum(1.0, max_dim / long_side)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "width": width,
                    "height": height,
                    "out_width": np.maximum(1, (width * scale).astype(np.int64)),
                    "out_height": np.maximum(1, (height * scale).astype(np.int64)),
                }
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(resize, RESIZED_SCHEMA)


def resize_images_sql(assets_sql: str, max_dim: int) -> str:
    return f"""
SELECT id, width, height,
       greatest(1, CAST(trunc(width * least(1.0, {max_dim} / greatest(width, height))) AS BIGINT)) AS out_width,
       greatest(1, CAST(trunc(height * least(1.0, {max_dim} / greatest(width, height))) AS BIGINT)) AS out_height
FROM (
  SELECT id, 16 + n % 240 AS width, 16 + (n * 7) % 240 AS height
  FROM (SELECT id, CAST(octet_length(data) AS BIGINT) AS n FROM ({assets_sql})
        WHERE modality = 'image')
)"""


# ---------------------------------------------------------------------------
# Video frame sampling: 1 row -> n rows inside the UDF (no shuffle)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_nbytes", T.LongType()),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Sample every ``every_n``-th frame of each video: ``(id, frame_idx,
    frame_off, frame_nbytes)``.

    The fake container stores frames contiguously: frame k of an m-frame
    payload occupies bytes ``[k*(nbytes//m), (k+1)*(nbytes//m))``. A real
    demuxer (pyav) slots into the same 1->N ``mapInPandas`` shape.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_off, out_sz = [], [], [], []
            for rid, data in zip(pdf["id"].to_numpy(dtype=np.int64), pdf["data"]):
                nbytes = len(data)
                n_frames = 1 + nbytes % 30
                fsize = nbytes // n_frames
                for k in range(0, n_frames, every_n):
                    out_id.append(rid)
                    out_idx.append(k)
                    out_off.append(k * fsize)
                    out_sz.append(fsize)
            yield pd.DataFrame(
                {
                    "id": np.asarray(out_id, dtype=np.int64),
                    "frame_idx": np.asarray(out_idx, dtype=np.int64),
                    "frame_off": np.asarray(out_off, dtype=np.int64),
                    "frame_nbytes": np.asarray(out_sz, dtype=np.int64),
                }
            )

    return assets.filter(F.col("modality") == "video").mapInPandas(sample, FRAME_SCHEMA)


def sample_frames_sql(assets_sql: str, every_n: int = 5) -> str:
    return f"""
SELECT id, k AS frame_idx, k * fsize AS frame_off, fsize AS frame_nbytes
FROM (
  SELECT id, n_frames, n // n_frames AS fsize,
         unnest(range(0, n_frames, {every_n})) AS k
  FROM (SELECT id, CAST(octet_length(data) AS BIGINT) AS n,
               1 + CAST(octet_length(data) AS BIGINT) % 30 AS n_frames
        FROM ({assets_sql}) WHERE modality = 'video')
)"""


# ---------------------------------------------------------------------------
# Feature extraction: binary -> fixed-width ARRAY<FLOAT> (KNN-ready)
# ---------------------------------------------------------------------------


def extract_features(assets: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram features per asset: ``(id, modality, features
    ARRAY<FLOAT>)``, L1-normalized. Deterministic stand-in for a CLIP-style
    image/audio encoder; the output plugs straight into the dense-KNN and
    IVF operators."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bins = np.linspace(0, 256, n_bins + 1)
        for pdf in batches:
            vecs = []
            for data in pdf["data"]:
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins)
                total = max(1, hist.sum())
                vecs.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(dtype=np.int64), "modality": pdf["modality"], "features": vecs}
            )

    return assets.mapInPandas(feats, schema)
