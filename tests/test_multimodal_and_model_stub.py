"""Multimodal binary-column operators + DETR-shaped model interface."""

import numpy as np
import pytest

from table_transformer_spark.config import (
    DETECTION_LABELS,
    STRUCTURE_LABELS,
)
from table_transformer_spark.pipeline.model_stub import (
    box_cxcywh_to_xyxy,
    fake_forward,
    outputs_to_objects,
    rescale_boxes,
)


def test_box_conversion_roundtrip():
    boxes = np.array([[0.5, 0.5, 0.2, 0.4], [0.25, 0.75, 0.1, 0.1]])
    xyxy = box_cxcywh_to_xyxy(boxes)
    np.testing.assert_allclose(xyxy[0], [0.4, 0.3, 0.6, 0.7])
    scaled = rescale_boxes(xyxy, (100, 200))
    np.testing.assert_allclose(scaled[0], [40, 60, 60, 140])


def test_fake_forward_recovers_objects():
    objs = [
        {"label": "table", "score": 0.95, "bbox": [10, 20, 200, 120]},
        {"label": "table rotated", "score": 0.7, "bbox": [0, 0, 50, 60]},
    ]
    logits, boxes = fake_forward(objs, (400, 300), DETECTION_LABELS,
                                 num_queries=15)
    assert logits.shape == (15, 3)
    assert boxes.shape == (15, 4)
    out = outputs_to_objects(logits, boxes, (400, 300), DETECTION_LABELS)
    assert len(out) == 2  # the 13 surplus queries are 'no object'
    assert out[0]["label"] == "table"
    assert out[0]["score"] == pytest.approx(0.95, abs=1e-6)
    np.testing.assert_allclose(out[0]["bbox"], [10, 20, 200, 120],
                               atol=1e-9)
    assert out[1]["score"] == pytest.approx(0.7, abs=1e-6)


def test_structure_queries_budget():
    objs = [{"label": "table row", "score": 0.9,
             "bbox": [0, i * 10, 100, (i + 1) * 10]} for i in range(130)]
    logits, boxes = fake_forward(objs, (100, 1400), STRUCTURE_LABELS,
                                 num_queries=125)
    out = outputs_to_objects(logits, boxes, (100, 1400), STRUCTURE_LABELS)
    assert len(out) == 125  # Q=125 caps detections, like the real model


def test_media_metadata_and_dimensions(spark):
    from table_transformer_spark.fixtures.spark_io import media_df
    from table_transformer_spark.operators.multimodal import (
        decode_dimensions,
        media_metadata,
    )

    media = media_df(spark, 4).cache()
    meta = media_metadata(media).collect()
    assert all(r.n_bytes > 0 and len(r.digest) == 64 for r in meta)

    dims = decode_dimensions(media).collect()
    assert all(r.width == 1000 and r.height == 1400 for r in dims)
    assert all(r.mode == "fixture" for r in dims)


def test_thumbnail_plan(spark):
    from table_transformer_spark.fixtures.spark_io import media_df
    from table_transformer_spark.operators.multimodal import thumbnail_plan

    plan = thumbnail_plan(media_df(spark, 2), max_dim=256).collect()
    for r in plan:
        assert max(r.out_width, r.out_height) <= 256
        assert r.scale == pytest.approx(256 / 1400, abs=1e-6)


def test_frame_sample_fanout(spark):
    from table_transformer_spark.fixtures.spark_io import media_df
    from table_transformer_spark.operators.multimodal import frame_sample

    media = media_df(spark, 2)
    n_media = media.count()
    frames = frame_sample(media, every_n=2, max_frames=4)
    assert frames.count() == n_media * 4


def test_media_embedding_shape_and_determinism(spark):
    from table_transformer_spark.fixtures.spark_io import media_df
    from table_transformer_spark.operators.multimodal import media_embedding

    media = media_df(spark, 2)
    e1 = {r.media_ref: list(r.embedding)
          for r in media_embedding(media, dim=16).collect()}
    e2 = {r.media_ref: list(r.embedding)
          for r in media_embedding(media_df(spark, 2), dim=16).collect()}
    assert e1 == e2
    for v in e1.values():
        assert len(v) == 16
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_real_codec_path_raises(spark):
    from table_transformer_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG\r\n\x1a\n....")  # real PNG magic, no PIL
