"""locate_table / locate_caption / aggregate_cell_bboxes +
standardize_and_fix_xml_annotation kernel goldens
(reference: scripts/process_pubmed.py:490-620, 768-887, 890-1018)."""

import pytest

from table_transformer_spark.kernels.canonicalize import (
    standardize_and_fix_xml_annotation,
)
from table_transformer_spark.kernels.locate import (
    aggregate_cell_bboxes,
    locate_caption,
    locate_table,
)


def make_page(words, x0=10.0, y0=20.0, per_line=10, w=45.0, h=10.0,
              dx=50.0, dy=12.0):
    """Deterministic page layout: word i at column i%per_line, line
    i//per_line."""
    out = []
    for i, t in enumerate(words):
        cx = x0 + (i % per_line) * dx
        cy = y0 + (i // per_line) * dy
        out.append({"text": t, "bbox": [cx, cy, cx + w, cy + h]})
    return out


PAGE_WORDS = [f"w{i:02d}" for i in range(40)]


def test_locate_table_anchors_planted_cells():
    page = make_page(PAGE_WORDS)
    # 2x2 table planted at words 5..12, two words per cell
    cells = [{"xml_text_content": f"{PAGE_WORDS[5 + 2*k]} {PAGE_WORDS[6 + 2*k]}",
              "row_nums": [k // 2], "column_nums": [k % 2]}
             for k in range(4)]
    cell_bboxes, inliers = locate_table(page, cells)
    assert inliers == list(range(5, 13))
    for k in range(4):
        i, j = 5 + 2 * k, 6 + 2 * k
        expect = [min(page[i]["bbox"][0], page[j]["bbox"][0]),
                  min(page[i]["bbox"][1], page[j]["bbox"][1]),
                  max(page[i]["bbox"][2], page[j]["bbox"][2]),
                  max(page[i]["bbox"][3], page[j]["bbox"][3])]
        assert cell_bboxes[k] == expect


def test_locate_table_word_zero_quirk():
    # the reference's `if word_num:` drops page-word index 0 from
    # inliers and hulls even when it matches
    page = make_page(PAGE_WORDS[:6])
    cells = [{"xml_text_content": f"{PAGE_WORDS[0]} {PAGE_WORDS[1]}"}]
    cell_bboxes, inliers = locate_table(page, cells)
    assert 0 not in inliers and 1 in inliers
    assert cell_bboxes[0] == page[1]["bbox"]  # word 0 excluded from hull


def test_locate_table_no_match():
    page = make_page(["aaa", "bbb"])
    cells = [{"xml_text_content": "zzzzzzz qqqqqqq"}]
    assert locate_table(page, cells) == (None, None)


def test_locate_caption_hull():
    page = make_page(PAGE_WORDS)
    caption = " ".join(PAGE_WORDS[20:24])
    bbox, inliers = locate_caption(page, caption)
    assert inliers == list(range(20, 24))
    assert bbox == [page[20]["bbox"][0], page[20]["bbox"][1],
                    page[23]["bbox"][2], page[23]["bbox"][3]]
    assert locate_caption(page, "xyzzy plugh") == ([], [])


def test_aggregate_cell_bboxes_grid():
    cells = [{"row_nums": [r], "column_nums": [c]}
             for r in range(2) for c in range(2)]
    cell_bboxes = {0: [10, 20, 20, 30], 1: [40, 21, 50, 29],
                   2: [11, 50, 19, 60], 3: [41, 52, 49, 58]}
    table_bbox, col_bb, row_bb, expanded = aggregate_cell_bboxes(
        cells, cell_bboxes, rotated=False)
    assert table_bbox == [10, 20, 50, 60]
    # rows snap x to table extent; cols snap y
    assert row_bb[0] == [10, 20, 50, 30] and row_bb[1] == [10, 50, 50, 60]
    assert col_bb[0] == [10, 20, 20, 60] and col_bb[1] == [40, 20, 50, 60]
    assert expanded[0] == [10, 20, 20, 30]
    assert expanded[3] == [40, 50, 50, 60]


def test_aggregate_cell_bboxes_rotated_and_empty():
    cells = [{"row_nums": [0], "column_nums": [0]},
             {"row_nums": [0], "column_nums": [1]}]
    cell_bboxes = {0: [10, 20, 20, 40], 1: [10, 50, 20, 70]}
    table_bbox, col_bb, row_bb, expanded = aggregate_cell_bboxes(
        cells, cell_bboxes, rotated=True)
    # rotated: columns run along y, rows along x
    assert table_bbox == [10, 20, 20, 70]
    assert col_bb[0][1] == 20 and col_bb[1][3] == 70
    assert row_bb[0] == [10, 20, 20, 70]
    assert aggregate_cell_bboxes(cells, {0: None, 1: None}) == \
        (None, {}, {}, {})


def test_aggregate_portrait_fn_decides_rotation():
    cells = [{"row_nums": [0], "column_nums": [0]}]
    bbs = {0: [1, 2, 3, 4]}
    _, _, row_bb, _ = aggregate_cell_bboxes(
        cells, bbs, portrait_fn=lambda bbox: False)  # landscape → rotated
    assert row_bb[0][1] == 2 and row_bb[0][3] == 4  # rotated snap on y


def _cell(text, rows, cols, header=False, bbox=None):
    return {"text": text, "row_nums": list(rows), "column_nums": list(cols),
            "is_column_header": header,
            "bbox": bbox or [0.0 + min(cols), 0.0 + min(rows),
                             1.0 + max(cols), 1.0 + max(rows)]}


def test_standardize_row0_colspan_forces_header():
    t = {"cells": [_cell("span", [0], [0, 1]),
                   _cell("x", [0], [2]),
                   _cell("a", [1], [0]), _cell("b", [1], [1]),
                   _cell("c", [1], [2]),
                   _cell("d", [2], [0]), _cell("e", [2], [1]),
                   _cell("f", [2], [2])],
         "num_rows": 3, "num_columns": 3}
    standardize_and_fix_xml_annotation(t)
    by_row0 = [c for c in t["cells"] if 0 in c["row_nums"]]
    assert all(c["is_column_header"] for c in by_row0)
    # headers end at row 1 (first row with num_columns distinct cells)
    assert all(c["is_column_header"] for c in t["cells"]
               if 1 in c["row_nums"])
    assert not any(c["is_column_header"] for c in t["cells"]
                   if 2 in c["row_nums"])


def test_standardize_blank_first_column_extends_header():
    # first column blank through row 1 (including the header row 0) →
    # header extends down to the first non-blank first-column row
    t = {"cells": [_cell("", [0], [0], header=True),
                   _cell("h2", [0], [1], header=True),
                   _cell("", [1], [0]), _cell("u", [1], [1]),
                   _cell("v", [2], [0]), _cell("w", [2], [1])],
         "num_rows": 3, "num_columns": 2}
    standardize_and_fix_xml_annotation(t)
    flags = {min(c["row_nums"]): c["is_column_header"] for c in t["cells"]}
    assert flags[0] and flags[1] and not flags[2]


def test_standardize_prh_absorb_and_label():
    # row 1: content only in first cell + a blank single-row cell →
    # blank absorbed, cell spans all columns, labeled PRH
    t = {"cells": [_cell("h1", [0], [0], header=True),
                   _cell("h2", [0], [1], header=True),
                   _cell("Section A", [1], [0]), _cell("", [1], [1]),
                   _cell("a", [2], [0]), _cell("b", [2], [1])],
         "num_rows": 3, "num_columns": 2}
    standardize_and_fix_xml_annotation(t)
    prh = [c for c in t["cells"] if c.get("is_projected_row_header")]
    assert len(prh) == 1 and prh[0]["text"] == "Section A"
    assert sorted(prh[0]["column_nums"]) == [0, 1]
    assert len(t["cells"]) == 5  # blank cell deleted


def test_standardize_first_column_blank_joins_above():
    t = {"cells": [_cell("h1", [0], [0], header=True),
                   _cell("h2", [0], [1], header=True),
                   _cell("key", [1], [0]), _cell("v1", [1], [1]),
                   _cell("", [2], [0]), _cell("v2", [2], [1])],
         "num_rows": 3, "num_columns": 2}
    standardize_and_fix_xml_annotation(t)
    key = [c for c in t["cells"] if c["text"] == "key"]
    assert key and sorted(key[0]["row_nums"]) == [1, 2]
    assert not any(c["text"] == "" and 0 in c["column_nums"]
                   and 2 in c["row_nums"] for c in t["cells"])


def test_aggregate_boundaries_df_matches_kernel_at_zero_coords(spark):
    """The DF twin must replicate the kernel's falsy-0.0 quirk: a
    0.0 coordinate stored in a min slot counts as unset, so the next
    cell (in cell_num order) REPLACES it.  Plant zeros both first
    (result = later value) and last (result = 0.0) and require
    row/col boundaries identical to aggregate_cell_bboxes."""
    cells = [
        {"row_nums": [0], "column_nums": [0]},
        {"row_nums": [0], "column_nums": [1]},
        {"row_nums": [1], "column_nums": [0]},
        {"row_nums": [1], "column_nums": [1]},
    ]
    bboxes = {
        0: [0.0, 0.0, 50.0, 20.0],   # zeros FIRST in col-0 / row-0
        1: [60.0, 5.0, 100.0, 20.0],
        2: [5.0, 30.0, 50.0, 45.0],
        3: [0.0, 28.0, 100.0, 46.0],  # x0 zero LAST in col-1
    }
    _, col_bb, row_bb, _ = aggregate_cell_bboxes(cells, bboxes)

    from table_transformer_spark.operators.locate_df import (
        aggregate_boundaries_df,
    )
    rows = [(1, 0, i, min(c["row_nums"]), max(c["row_nums"]),
             min(c["column_nums"]), max(c["column_nums"]),
             *bboxes[i]) for i, c in enumerate(cells)]
    located = spark.createDataFrame(
        rows, "doc_id long, table_num int, cell_num int, row_lo int, "
              "row_hi int, col_lo int, col_hi int, "
              "x0 double, y0 double, x1 double, y1 double")
    got = {(r.kind, r.idx): (r.x0, r.y0, r.x1, r.y1)
           for r in aggregate_boundaries_df(located).collect()}
    want = {("row", i): tuple(b) for i, b in row_bb.items()}
    want |= {("col", i): tuple(b) for i, b in col_bb.items()}
    assert got == want
    # the quirk actually fired: plain min would give y0=0.0 for row 0
    assert got[("row", 0)][1] == 5.0
    assert got[("col", 0)][0] == 5.0
    assert got[("col", 1)][0] == 0.0  # zero arriving last sticks
