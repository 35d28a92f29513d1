"""Multimodal binary-column plumbing: schemas, Arrow batch shapes, fake
decode determinism, 1->N frame fan-out, KNN-ready features, real-codec stub.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_spark.operators import multimodal as MM

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def assets(spark):
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.col("doc_id").alias("id"), F.col("text").alias("document"))
    )
    a = MM.synthesize_assets(docs)
    a.cache().count()
    return a


def test_asset_schema_and_payload(assets):
    assert [f.name for f in assets.schema.fields] == ["id", "modality", "mime", "data"]
    row = assets.filter(F.col("id") == 1).first()
    assert row.modality == "audio" and row.mime == "audio/x-fake"
    assert isinstance(row.data, (bytes, bytearray)) and len(row.data) > 0


def test_decode_meta_matches_numpy_model(assets):
    rows = {r.id: r for r in MM.decode_assets(assets).collect()}
    for a in assets.collect():
        n = len(a.data)
        m = rows[a.id]
        assert m.nbytes == n
        if a.modality == "audio":
            assert (m.width, m.height, m.channels) == (0, 0, 1)
            assert m.sample_rate == 16_000 and m.duration_ms == n * 4 * 1000 // 16_000
        else:
            assert m.width == 16 + n % 240 and m.height == 16 + (n * 7) % 240
            if a.modality == "video":
                assert m.n_frames == 1 + n % 30
                assert m.duration_ms == m.n_frames * 1000 // 25


def test_resize_never_upscales_and_caps_long_side(assets):
    out = MM.resize_images(assets, max_dim=64).collect()
    assert out, "image rows expected"
    for r in out:
        assert max(r.out_width, r.out_height) <= max(64, 1)
        assert r.out_width <= r.width and r.out_height <= r.height
        if max(r.width, r.height) <= 64:  # no upscale
            assert (r.out_width, r.out_height) == (r.width, r.height)


def test_frame_sample_fan_out(assets):
    frames = MM.sample_frames(assets, every_n=5)
    pdf = frames.toPandas()
    vids = {r.id: len(r.data) for r in assets.filter(F.col("modality") == "video").collect()}
    assert set(pdf["id"]) == set(vids)
    for vid, nbytes in vids.items():
        n_frames = 1 + nbytes % 30
        sub = pdf[pdf["id"] == vid]
        assert list(sub["frame_idx"]) == list(range(0, n_frames, 5))
        assert (sub["frame_nbytes"] == nbytes // n_frames).all()
        assert (sub["frame_off"] == sub["frame_idx"] * (nbytes // n_frames)).all()


def test_features_are_knn_ready(assets):
    feats = MM.extract_features(assets, n_bins=16)
    row = feats.first()
    assert len(row.features) == 16
    vec = np.asarray(row.features)
    assert abs(vec.sum() - 1.0) < 1e-3 and (vec >= 0).all()
    # plugs into the dense-KNN operator without adaptation
    from chroma_spark.functions.distance import cosine

    a = feats.select(F.col("id").alias("id_a"), F.col("features").alias("va")).limit(5)
    b = feats.select(F.col("id").alias("id_b"), F.col("features").alias("vb")).limit(5)
    d = a.crossJoin(b).select(cosine(F.col("va"), F.col("vb")).alias("d")).collect()
    assert all(r.d is not None and r.d >= -1e-6 for r in d)


def test_real_decoder_stub_raises(assets):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        MM.decode_assets(assets, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc.value)
