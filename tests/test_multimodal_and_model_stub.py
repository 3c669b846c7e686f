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


def test_decode_image_real_pil_branch_with_injected_codec(monkeypatch):
    """The non-fixture branch must actually decode via the PIL API
    (Image.open on a BytesIO), not raise unconditionally — proven here
    by injecting a minimal codec object implementing the same surface,
    so the wiring is exercised even where PIL is not installed."""
    import table_transformer_spark.operators.multimodal as mm

    class _Img:
        width, height, mode = 320, 200, "RGB"

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _FakeImageModule:
        @staticmethod
        def open(fp):
            assert fp.read(4) == b"\x89PNG"
            return _Img()

    monkeypatch.setattr(mm, "_HAS_PIL", True)
    monkeypatch.setattr(mm, "Image", _FakeImageModule, raising=False)
    meta = mm._decode_image(b"\x89PNG\r\n\x1a\nrest-of-payload")
    assert meta == {"width": 320, "height": 200, "mode": "RGB"}


def test_decode_dimensions_real_pil_end_to_end(spark):
    """When PIL is actually installed, a real PNG decodes through the
    Spark decode stage (skipped where the container lacks PIL)."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")

    buf = io.BytesIO()
    PIL_Image.new("RGB", (17, 23)).save(buf, format="PNG")
    media = spark.createDataFrame([("img://real/0", buf.getvalue())],
                                  "media_ref string, payload binary")
    from table_transformer_spark.operators.multimodal import (
        decode_dimensions,
    )
    [row] = decode_dimensions(media).collect()
    assert (row.width, row.height, row.mode) == (17, 23, "RGB")


def test_outputs_to_objects_accepts_torch_tensors():
    """The inference seam takes raw (Q, C+1)/(Q, 4) arrays — a real
    torch forward's detached tensors drop in unchanged (skipped where
    torch is absent)."""
    torch = pytest.importorskip("torch")

    class TinyDetr(torch.nn.Module):
        def forward(self, n_queries, n_classes):
            logits = torch.full((n_queries, n_classes), -4.0)
            logits[:, -1] = 4.0          # default: 'no object'
            logits[0, 0] = 6.0           # query 0 → class 0, high score
            boxes = torch.tensor([[0.5, 0.5, 0.2, 0.2]]).repeat(
                n_queries, 1)
            return {"pred_logits": logits, "pred_boxes": boxes}

    names = ["table", "table rotated", "no object"]
    out = TinyDetr()(5, len(names))
    objs = outputs_to_objects(out["pred_logits"].detach().numpy(),
                              out["pred_boxes"].detach().numpy(),
                              (1000.0, 800.0), names)
    assert len(objs) == 1 and objs[0]["label"] == "table"
    assert objs[0]["score"] > 0.8
    assert objs[0]["bbox"] == [400.0, 320.0, 600.0, 480.0]


def test_post_process_coco_semantics():
    """PostProcess (detr/models/detr.py:260-288): max over REAL classes
    only ('no object' excluded), every query kept, (h, w) scaling."""
    from table_transformer_spark.pipeline.model_stub import post_process

    # 1 image, 2 queries, 2 real classes + no-object
    logits = np.array([[[4.0, 0.0, 8.0],     # no-object wins overall,
                        [1.0, 3.0, 0.0]]])   # but class argmax = 0 / 1
    boxes = np.array([[[0.5, 0.5, 0.5, 0.5],
                       [0.25, 0.25, 0.1, 0.1]]])
    sizes = np.array([[200.0, 100.0]])  # (height, width)
    [res] = post_process(logits, boxes, sizes)
    assert list(res["labels"]) == [0, 1]          # no-object never wins
    assert len(res["scores"]) == 2                # every query kept
    # softmax over ALL classes, max over the real ones
    e = np.exp(logits[0, 0] - logits[0, 0].max())
    assert res["scores"][0] == pytest.approx((e / e.sum())[0])
    # cxcywh (0.5,0.5,0.5,0.5) → xyxy (0.25,0.25,0.75,0.75) × (w,h,w,h)
    assert list(res["boxes"][0]) == [25.0, 50.0, 75.0, 150.0]
