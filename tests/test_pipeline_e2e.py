"""End-to-end span-sequence equality (the north-rule invariant).

Two layers of oracle:

1. *clean* mode: pipeline output must equal the generator-designed
   ground truth exactly — (kind, text, media_ref, offset) per doc —
   without the kernel appearing on the oracle side at all.
2. *noisy* mode: Spark output must equal a local single-threaded run of
   the same kernel chain (distribution/determinism invariance; the
   perturbations exercise thresholding + NMS + containment suppression).
"""

import pytest

from table_transformer_spark.fixtures.generate import (
    expected_spans_clean,
    gen_corpus,
)
from table_transformer_spark.fixtures.spark_io import documents_df, media_df
from table_transformer_spark.pipeline.extract import extract, run_cells

N_DOCS = 12


@pytest.fixture(scope="module")
def corpus(spark):
    docs = documents_df(spark, N_DOCS).cache()
    media = media_df(spark, N_DOCS).cache()
    docs.count(), media.count()
    return docs, media


def collect_spans(df):
    rows = df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.offset, r.kind, r.text, r.media_ref))
    return {d: [(k, t, m) for _, k, t, m in sorted(v)]
            for d, v in by_doc.items()}


def test_clean_mode_matches_designed_truth(spark, corpus):
    docs, media = corpus
    got = collect_spans(extract(docs, media, mode="clean"))

    expected = {}
    for doc in gen_corpus(N_DOCS):
        spans = expected_spans_clean(doc)
        expected[doc["doc_id"]] = [(s["kind"], s["text"], s["media_ref"])
                                   for s in spans]

    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], f"mismatch in {doc_id}"


def test_offsets_are_dense_and_zero_based(spark, corpus):
    docs, media = corpus
    out = extract(docs, media, mode="clean").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.offset)
    for doc_id, offsets in by_doc.items():
        assert sorted(offsets) == list(range(len(offsets)))


def test_noisy_mode_matches_local_sequential_kernel(spark, corpus):
    docs, media = corpus
    got = collect_spans(extract(docs, media, mode="noisy"))
    expected = _local_reference_run(N_DOCS)
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], f"mismatch in {doc_id}"


def test_fused_equals_staged_pipeline(spark, corpus):
    """The fused single-pass page stage must produce exactly the rows of
    the staged operator-algebra pipeline, in both modes."""
    docs, media = corpus
    for mode in ("clean", "noisy"):
        fused = run_cells(docs, media, mode=mode, fused=True)
        staged = run_cells(docs, media, mode=mode, fused=False)

        def key(r):
            return (r.doc_id, r.media_ref, r.page_offset, r.table_num,
                    r.cell_num, tuple(round(v, 6) for v in r.bbox),
                    tuple(r.row_nums), tuple(r.column_nums),
                    r.is_column_header, r.is_projected_row_header,
                    r.cell_text, round(r.confidence, 9))

        assert sorted(map(key, fused.collect())) == \
            sorted(map(key, staged.collect())), f"mode={mode}"


def test_cell_rows_carry_confidence_and_grid(spark, corpus):
    docs, media = corpus
    cells = run_cells(docs, media, mode="clean")
    sample = cells.limit(50).collect()
    assert sample
    for c in sample:
        assert 0.0 <= c.confidence <= 1.0
        assert c.row_nums and c.column_nums
        assert c.cell_num >= 0


def _local_reference_run(n_docs):
    """Single-threaded reimplementation of the job over the same fixture
    corpus: the sequential 'reference' the distributed run must match."""
    from table_transformer_spark.config import (
        DEFAULT_CROP_PADDING,
        DETECTION_CLASS_THRESHOLDS,
        STRUCTURE_CLASS_THRESHOLDS,
    )
    from table_transformer_spark.fixtures.generate import synth_page
    from table_transformer_spark.geometry import iob
    from table_transformer_spark.kernels.structure import objects_to_cells

    pad = DEFAULT_CROP_PADDING
    out = {}
    for doc in gen_corpus(n_docs):
        spans = []
        for span in sorted(doc["spans"], key=lambda s: s["offset"]):
            if span["kind"] == "text":
                spans.append(("text", span["text"], ""))
                continue
            page = synth_page(span["media_ref"])
            for table_num, det in enumerate(page["detections"]):
                if det["score"] < DETECTION_CLASS_THRESHOLDS[det["label"]]:
                    continue
                crop = [det["bbox"][0] - pad, det["bbox"][1] - pad,
                        det["bbox"][2] + pad, det["bbox"][3] + pad]
                tokens = []
                for t in page["tokens"]:
                    if iob(t["bbox"], crop) >= 0.5:
                        tokens.append({**t, "bbox": [
                            t["bbox"][0] - crop[0], t["bbox"][1] - crop[1],
                            t["bbox"][2] - crop[0], t["bbox"][3] - crop[1]]})
                if det["label"] == "table rotated":
                    h = crop[3] - crop[1]
                    tokens = [{**t, "bbox": [h - t["bbox"][3] - 1,
                                             t["bbox"][0],
                                             h - t["bbox"][1] - 1,
                                             t["bbox"][2]]}
                              for t in tokens]
                objects = [
                    {"label": o["label"], "score": float(o["score"]),
                     "bbox": [o["bbox"][0] + pad, o["bbox"][1] + pad,
                              o["bbox"][2] + pad, o["bbox"][3] + pad]}
                    for o in page["tables"][table_num]["structure_noisy"]]
                table_objs = sorted(
                    [o for o in objects if o["label"] == "table"],
                    key=lambda o: -o["score"])
                table_bbox = list(table_objs[0]["bbox"]) if table_objs \
                    else [0.0, 0.0, 1000.0, 1000.0]
                in_table = [o for o in objects
                            if iob(o["bbox"], table_bbox) >= 0.5]
                toks = [t for t in tokens
                        if iob(t["bbox"], table_bbox) >= 0.5]
                _, cells, _ = objects_to_cells(
                    {"bbox": table_bbox, "page_num": 0}, in_table, toks,
                    STRUCTURE_CLASS_THRESHOLDS)
                cells = sorted(cells, key=lambda c: (min(c["row_nums"]),
                                                     min(c["column_nums"])))
                for cell in cells:
                    if cell["cell_text"]:
                        spans.append(("cell", cell["cell_text"],
                                      span["media_ref"]))
        out[doc["doc_id"]] = spans
    return out
