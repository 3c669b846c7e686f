"""Unit tests for the per-table structure canonicalization kernel
(reference chain ``objects_to_cells``, src/postprocess.py:61-843)."""

import pytest

from table_transformer_spark.config import STRUCTURE_CLASS_THRESHOLDS
from table_transformer_spark.kernels.slotting import (
    greedy_nms,
    nms_by_containment,
    slot_into_containers,
)
from table_transformer_spark.kernels.structure import objects_to_cells


def obj(label, bbox, score=1.0):
    return {"label": label, "score": score, "bbox": list(bbox)}


def token(text, bbox, n):
    return {"text": text, "bbox": list(bbox), "span_num": n,
            "line_num": 0, "block_num": 0, "flags": 0}


def simple_table(n_rows=3, n_cols=2, row_h=30, col_w=50, header=True):
    """Clean 3×2 grid: rows/columns/one header box + one token per cell."""
    w, h = n_cols * col_w, n_rows * row_h
    objects = [obj("table", [0, 0, w, h])]
    for r in range(n_rows):
        objects.append(obj("table row", [0, r * row_h, w, (r + 1) * row_h]))
    for c in range(n_cols):
        objects.append(obj("table column", [c * col_w, 0, (c + 1) * col_w, h]))
    if header:
        objects.append(obj("table column header", [0, 0, w, row_h]))
    tokens = []
    i = 0
    for r in range(n_rows):
        for c in range(n_cols):
            tokens.append(token(f"r{r}c{c}",
                                [c * col_w + 5, r * row_h + 5,
                                 c * col_w + 20, r * row_h + 15], i))
            i += 1
    return {"bbox": [0, 0, w, h], "page_num": 0}, objects, tokens


def run(table, objects, tokens):
    return objects_to_cells(table, objects, tokens,
                            STRUCTURE_CLASS_THRESHOLDS)


def test_clean_grid_produces_full_cell_matrix():
    structures, cells, confidence = run(*simple_table())
    assert len(cells) == 6
    assert confidence == pytest.approx(1.0)
    by_grid = {(c["row_nums"][0], c["column_nums"][0]): c for c in cells}
    for r in range(3):
        for c in range(2):
            cell = by_grid[(r, c)]
            assert cell["cell_text"] == f"r{r}c{c}"
            assert cell["header"] == (r == 0)
            assert cell["subheader"] is False


def test_cells_are_column_major_ordered():
    _, cells, _ = run(*simple_table())
    order = [(c["column_nums"][0], c["row_nums"][0]) for c in cells]
    assert order == sorted(order)  # outer loop over columns


def test_no_columns_means_no_cells():
    table, objects, tokens = simple_table()
    objects = [o for o in objects if o["label"] != "table column"]
    structures, cells, confidence = run(table, objects, tokens)
    assert cells == []
    assert confidence == 0


def test_header_spanning_cell_merges_subcells():
    table, objects, tokens = simple_table()
    # spanning cell across the two header-row grid cells
    objects.append(obj("table spanning cell", [0, 0, 100, 30], score=0.9))
    # drop the individual header-row tokens, give the span one token
    tokens = [t for t in tokens if not t["text"].startswith("r0")]
    tokens.append(token("TITLE", [30, 5, 70, 15], 99))
    _, cells, _ = run(table, objects, tokens)
    merged = [c for c in cells if len(c["column_nums"]) > 1]
    assert len(merged) == 1
    m = merged[0]
    assert m["row_nums"] == [0]
    assert m["column_nums"] == [0, 1]
    assert m["header"] is True
    assert m["cell_text"] == "TITLE"
    assert len(cells) == 5  # 4 body cells + 1 merged header


def test_projected_row_header_flag():
    table, objects, tokens = simple_table(header=False)
    # full-width body cell in row 1 → projected row header
    objects.append(obj("table projected row header", [0, 30, 100, 60],
                       score=0.8))
    tokens = [t for t in tokens if not t["text"].startswith("r1")]
    tokens.append(token("Section A", [5, 35, 60, 55], 98))
    _, cells, _ = run(table, objects, tokens)
    prh = [c for c in cells if c["subheader"]]
    assert len(prh) == 1
    assert prh[0]["cell_text"] == "Section A"
    assert prh[0]["column_nums"] == [0, 1]


def test_duplicate_row_suppressed_by_containment_nms():
    table, objects, tokens = simple_table()
    # near-duplicate of row 0 at lower confidence: owns the same tokens
    objects.append(obj("table row", [0, 1, 100, 31], score=0.6))
    _, cells, _ = run(table, objects, tokens)
    assert len(cells) == 6  # still a 3×2 grid


def test_row_without_content_dropped():
    table, objects, tokens = simple_table()
    # an extra row band with no tokens at all
    objects.append(obj("table row", [0, 90, 100, 120], score=0.9))
    _, cells, _ = run(table, objects, tokens)
    rows_seen = {r for c in cells for r in c["row_nums"]}
    assert rows_seen == {0, 1, 2}


def test_nms_keeps_higher_score():
    a = {"label": "x", "score": 0.9, "bbox": [0, 0, 10, 10]}
    b = {"label": "x", "score": 0.5, "bbox": [0, 0, 10, 10]}
    kept = greedy_nms([b, a], match_criteria="iou", match_threshold=0.5)
    assert kept == [a]


def test_nms_divide_by_zero_pair_skipped():
    a = {"score": 0.9, "bbox": [0, 0, 0, 0]}   # zero area
    b = {"score": 0.5, "bbox": [0, 0, 0, 0]}
    kept = greedy_nms([a, b], match_criteria="object2_overlap",
                      match_threshold=0.5)
    assert len(kept) == 2  # reference swallows the ZeroDivisionError


def test_nms_by_containment_never_suppresses_top():
    # top-score container with zero packages survives (reference loop
    # starts at index 1)
    empty_top = {"score": 0.9, "bbox": [1000, 1000, 1010, 1010]}
    full = {"score": 0.5, "bbox": [0, 0, 10, 10]}
    pkg = [{"bbox": [1, 1, 2, 2]}]
    kept = nms_by_containment([empty_top, full], pkg)
    assert empty_top in kept and full in kept


def test_slotting_tie_goes_to_first_container():
    containers = [{"bbox": [0, 0, 10, 10]}, {"bbox": [10, 0, 20, 10]}]
    # package exactly split between the two
    packages = [{"bbox": [5, 0, 15, 10]}]
    by_container, by_package, best = slot_into_containers(
        containers, packages, overlap_threshold=0.4)
    assert by_package[0] == [0]
    assert best[0] == pytest.approx(0.5)


def test_slotting_multi_assignment():
    containers = [{"bbox": [0, 0, 10, 10]}, {"bbox": [10, 0, 20, 10]}]
    packages = [{"bbox": [5, 0, 15, 10]}]
    by_container, by_package, _ = slot_into_containers(
        containers, packages, overlap_threshold=0.4,
        unique_assignment=False)
    assert by_package[0] == [0, 1]


def test_kernel_is_pure():
    table, objects, tokens = simple_table()
    import copy
    before = copy.deepcopy((table, objects, tokens))
    run(table, objects, tokens)
    assert (table, objects, tokens) == before


# -- property: vectorized slotting ≡ the reference's literal semantics ------

from hypothesis import given, settings
from hypothesis import strategies as st

_coord = st.integers(min_value=0, max_value=40)


def _box():
    return st.tuples(_coord, _coord, _coord, _coord).map(
        lambda t: [float(min(t[0], t[2])), float(min(t[1], t[3])),
                   float(max(t[0], t[2]) + 1), float(max(t[1], t[3]) + 1)])


def _slot_reference(containers, packages, overlap_threshold,
                    unique_assignment, forced_assignment):
    """Literal transcription of src/postprocess.py:208-248 (python
    sorted, per-package loops) used as the property-test oracle."""
    by_container = [[] for _ in containers]
    by_package = [[] for _ in packages]
    best_scores = []
    if not containers or not packages:
        return by_container, by_package, best_scores
    from table_transformer_spark.geometry import box_area, box_intersect
    for p_num, pkg in enumerate(packages):
        area = box_area(pkg["bbox"])
        scored = [{"container_num": c_num,
                   "score": box_area(box_intersect(con["bbox"], pkg["bbox"]))
                   / area}
                  for c_num, con in enumerate(containers)]
        scored = sorted(scored, key=lambda k: -k["score"])
        best = scored[0]
        best_scores.append(best["score"])
        if forced_assignment or best["score"] >= overlap_threshold:
            by_container[best["container_num"]].append(p_num)
            by_package[p_num].append(best["container_num"])
        if not unique_assignment:
            for m in scored[1:]:
                if m["score"] >= overlap_threshold:
                    by_container[m["container_num"]].append(p_num)
                    by_package[p_num].append(m["container_num"])
                else:
                    break
    return by_container, by_package, best_scores


@settings(max_examples=150, deadline=None)
@given(st.lists(_box(), min_size=1, max_size=6),
       st.lists(_box(), min_size=1, max_size=8),
       st.sampled_from([0.001, 0.25, 0.5, 0.9]),
       st.booleans(), st.booleans())
def test_slotting_matches_reference_semantics(cons, pkgs, tau, unique,
                                              forced):
    containers = [{"bbox": b} for b in cons]
    packages = [{"bbox": b} for b in pkgs]
    got = slot_into_containers(containers, packages, tau, unique, forced)
    want = _slot_reference(containers, packages, tau, unique, forced)
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == pytest.approx(want[2])
