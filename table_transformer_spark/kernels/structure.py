"""Table-structure canonicalization: model objects → consistent cell grid.

This is the deterministic per-table kernel of the pipeline — the faithful
re-expression of the reference chain ``objects_to_cells`` =
``objects_to_table_structures`` + ``table_structure_to_cells``
(``src/postprocess.py:61-843``).  It runs inside
``groupBy(doc_id, table_id).applyInPandas`` on the Spark side; inputs are
small (≤125 structure objects per table), so the sequential greedy passes
match the reference bit-for-bit while Spark parallelizes *across* tables.

Field conventions follow the ``postprocess.py`` twin of the chain:
rows carry ``header`` (bool), supercells carry ``subheader`` (bool,
True = projected row header).  All mutation quirks of the reference
(shared-dict rewrites, in-place list removal, greedy order) are
reproduced via explicit copies + identical operation order.
"""

from __future__ import annotations

import copy

import numpy as np

from ..geometry import (
    Box,
    box_area,
    box_intersect,
    iob,
    np_box_area,
    np_pairwise_intersection,
)
from .slotting import (
    drop_containers_without_text,
    filter_by_score,
    greedy_nms,
    nms_by_containment,
    order_by_score,
    order_left_to_right,
    order_top_to_bottom,
    slot_into_containers,
)
from .text import assemble_text

__all__ = [
    "objects_to_cells",
    "build_table_structures",
    "structures_to_cells",
    "refine_rows",
    "refine_columns",
    "align_rows",
    "align_columns",
    "align_headers",
    "align_supercells",
    "nms_supercells",
    "header_supercell_tree",
    "shrink_supercell_overlap",
]


# --------------------------------------------------------------------------
# row/column refinement (src/postprocess.py:147-180)
# --------------------------------------------------------------------------

def refine_rows(rows, tokens, score_threshold=None):
    """Containment-NMS + empty-drop when tokens exist, plain NMS
    otherwise; then top-to-bottom order (``src/postprocess.py:147-162``)."""
    if len(tokens) > 0:
        rows = nms_by_containment(rows, tokens, overlap_threshold=0.5)
        drop_containers_without_text(tokens, rows)
    else:
        rows = greedy_nms(rows, match_criteria="object2_overlap",
                          match_threshold=0.5, keep_higher=True)
    if len(rows) > 1:
        rows = order_top_to_bottom(rows)
    return rows


def refine_columns(columns, tokens, score_threshold=None):
    """Column twin of :func:`refine_rows`; bare-NMS threshold is 0.25
    (``src/postprocess.py:165-180``)."""
    if len(tokens) > 0:
        columns = nms_by_containment(columns, tokens, overlap_threshold=0.5)
        drop_containers_without_text(tokens, columns)
    else:
        columns = greedy_nms(columns, match_criteria="object2_overlap",
                             match_threshold=0.25, keep_higher=True)
    if len(columns) > 1:
        columns = order_left_to_right(columns)
    return columns


# --------------------------------------------------------------------------
# alignment (src/postprocess.py:372-401,488-639)
# --------------------------------------------------------------------------

def align_rows(rows, table_bbox):
    """Snap every row's x-extent to the table bbox
    (``src/postprocess.py:388-401``)."""
    for row in rows:
        row["bbox"][0] = table_bbox[0]
        row["bbox"][2] = table_bbox[2]
    return rows


def align_columns(columns, table_bbox):
    """Snap every column's y-extent to the table bbox
    (``src/postprocess.py:372-385``)."""
    for col in columns:
        col["bbox"][1] = table_bbox[1]
        col["bbox"][3] = table_bbox[3]
    return columns


def align_headers(headers, rows):
    """Header = convex hull of the maximal *prefix* run of rows that
    overlap any header box ≥50% of the row height
    (``src/postprocess.py:488-535``).

    Quirks preserved: the run is forced to start at row 0 by prepending
    ``range(first+1)``; duplicate row numbers (several header boxes over
    one row) terminate the run early because the scan demands strictly
    consecutive numbers.
    """
    for row in rows:
        row["header"] = False

    hit_rows = []
    for header in headers:
        for row_num, row in enumerate(rows):
            row_height = row["bbox"][3] - row["bbox"][1]
            overlap = (min(row["bbox"][3], header["bbox"][3])
                       - max(row["bbox"][1], header["bbox"][1]))
            if row_height > 0 and overlap / row_height >= 0.5:
                hit_rows.append(row_num)

    if not hit_rows:
        return []

    if hit_rows[0] > 0:
        hit_rows = list(range(hit_rows[0] + 1)) + hit_rows

    hull = Box()
    last = -1
    for row_num in hit_rows:
        if row_num != last + 1:
            break  # stop at the first gap: single top header only
        rows[row_num]["header"] = True
        hull.include_rect(rows[row_num]["bbox"])
        last = row_num

    return [{"bbox": hull.tolist()}]


def align_supercells(supercells, rows, columns):
    """Snap each spanning cell to the rows/columns it overlaps ≥50% of,
    with header-boundary and span-leniency rules
    (``src/postprocess.py:538-639``).

    * a supercell may not cross the header/body boundary — the smaller
      row group is dropped (``:572-576``);
    * header *span* supercells ('span' key present) get a ×2-lenient
      column test (``:598-603``) and must sit in the header (``:579-580``);
    * surviving header span supercells propagate synthetic single-row
      supercells upward so the header tree stays connected (``:625-637``).
    """
    aligned = []

    for sc in supercells:
        sc["header"] = False
        header_rows, data_rows = set(), set()
        sc_h = sc["bbox"][3] - sc["bbox"][1]
        for row_num, row in enumerate(rows):
            row_h = row["bbox"][3] - row["bbox"][1]
            overlap = (min(row["bbox"][3], sc["bbox"][3])
                       - max(row["bbox"][1], sc["bbox"][1]))
            if "span" in sc:
                frac = max(overlap / row_h if row_h > 0 else 0.0,
                           overlap / sc_h if sc_h > 0 else 0.0)
            else:
                frac = overlap / row_h if row_h > 0 else 0.0
            if frac >= 0.5:
                if row.get("header"):
                    header_rows.add(row_num)
                else:
                    data_rows.add(row_num)

        if header_rows and data_rows:
            # cannot span the header boundary: keep the larger group
            if len(data_rows) > len(header_rows):
                header_rows = set()
            else:
                data_rows = set()
        if header_rows:
            sc["header"] = True
        elif "span" in sc:
            continue  # span supercells must live in the header

        picked_rows = data_rows | header_rows
        row_hull = None
        for row_num in picked_rows:
            if row_hull is None:
                row_hull = Box(rows[row_num]["bbox"])
            else:
                row_hull.include_rect(rows[row_num]["bbox"])
        if row_hull is None:
            continue

        picked_cols = []
        col_hull = None
        sc_w = sc["bbox"][2] - sc["bbox"][0]
        for col_num, col in enumerate(columns):
            col_w = col["bbox"][2] - col["bbox"][0]
            overlap = (min(col["bbox"][2], sc["bbox"][2])
                       - max(col["bbox"][0], sc["bbox"][0]))
            if "span" in sc:
                frac = max(overlap / col_w if col_w > 0 else 0.0,
                           overlap / sc_w if sc_w > 0 else 0.0)
                if sc["header"]:
                    frac *= 2  # effectively threshold 0.25
            else:
                frac = overlap / col_w if col_w > 0 else 0.0
            if frac >= 0.5:
                picked_cols.append(col_num)
                if col_hull is None:
                    col_hull = Box(col["bbox"])
                else:
                    col_hull.include_rect(col["bbox"])
        if col_hull is None:
            continue

        sc["bbox"] = row_hull.intersect(col_hull).tolist()

        # only a true supercell if it spans >1 row or >1 column
        if picked_rows and picked_cols and (len(picked_rows) > 1 or len(picked_cols) > 1):
            sc["row_numbers"] = sorted(picked_rows)
            sc["column_numbers"] = picked_cols
            aligned.append(sc)

            if "span" in sc and sc["header"] and len(sc["column_numbers"]) > 1:
                for row_num in range(0, min(sc["row_numbers"])):
                    span_cols = [columns[i] for i in sc["column_numbers"]]
                    span_rows = [rows[i] for i in sc["row_numbers"]]
                    aligned.append({
                        "row_numbers": [row_num],
                        "column_numbers": list(sc["column_numbers"]),
                        "score": sc["score"],
                        "propagated": True,
                        "bbox": [
                            min(c["bbox"][0] for c in span_cols),
                            min(r["bbox"][1] for r in span_rows),
                            max(c["bbox"][2] for c in span_cols),
                            max(r["bbox"][3] for r in span_rows),
                        ],
                    })

    return aligned


def shrink_supercell_overlap(winner, loser):
    """Shrink *loser*'s row/column sets until it no longer shares grid
    cells with *winner*, removing whichever dimension loses fewer grid
    cells each step (``src/postprocess.py:846-893``).  Mutates *loser*.
    """
    common_rows = set(winner["row_numbers"]) & set(loser["row_numbers"])
    common_cols = set(winner["column_numbers"]) & set(loser["column_numbers"])

    while common_rows and common_cols:
        if len(loser["row_numbers"]) < len(loser["column_numbers"]):
            # fewer rows than columns → drop a column (cheaper)
            lo, hi = min(loser["column_numbers"]), max(loser["column_numbers"])
            if hi in common_cols:
                common_cols.remove(hi)
                loser["column_numbers"].remove(hi)
            elif lo in common_cols:
                common_cols.remove(lo)
                loser["column_numbers"].remove(lo)
            else:
                loser["column_numbers"] = []
                common_cols = set()
        else:
            lo, hi = min(loser["row_numbers"]), max(loser["row_numbers"])
            if hi in common_rows:
                common_rows.remove(hi)
                loser["row_numbers"].remove(hi)
            elif lo in common_rows:
                common_rows.remove(lo)
                loser["row_numbers"].remove(lo)
            else:
                loser["row_numbers"] = []
                common_rows = set()


def nms_supercells(supercells):
    """Resolve supercell overlap by shrinking the lower-confidence one,
    suppressing it when it degenerates (``src/postprocess.py:642-663``).

    Quirk preserved: a later supercell is shrunk against *every* earlier
    one, including already-suppressed ones.
    """
    supercells = order_by_score(supercells)
    suppressed = [False] * len(supercells)
    for j in range(1, len(supercells)):
        for i in range(j):
            shrink_supercell_overlap(supercells[i], supercells[j])
        sc = supercells[j]
        if ((len(sc["row_numbers"]) < 2 and len(sc["column_numbers"]) < 2)
                or not sc["row_numbers"] or not sc["column_numbers"]):
            suppressed[j] = True
    return [sc for sc, s in zip(supercells, suppressed) if not s]


def header_supercell_tree(supercells):
    """Enforce the single-parent tree property over header supercells:
    every row above a header supercell must contribute exactly one
    ancestor, else the supercell is deleted from the main list
    (``src/postprocess.py:666-689``).

    Quirk preserved: deleted supercells stay in the local candidate list
    and keep counting as ancestors for later candidates.
    """
    header_scs = [sc for sc in supercells if sc.get("header")]
    header_scs = order_by_score(header_scs)

    for sc in header_scs[:]:
        ancestors_by_row = {}
        min_row = min(sc["row_numbers"])
        for other in header_scs:
            if max(other["row_numbers"]) < min_row:
                if set(sc["column_numbers"]) <= set(other["column_numbers"]):
                    for r in other["row_numbers"]:
                        ancestors_by_row[r] = ancestors_by_row.get(r, 0) + 1
        for row in range(min_row):
            if ancestors_by_row.get(row, 0) != 1:
                supercells.remove(sc)
                break


# --------------------------------------------------------------------------
# structure assembly (src/postprocess.py:83-144,404-440)
# --------------------------------------------------------------------------

def _refine_structures(table_bbox, structures, tokens, class_thresholds):
    """Threshold + NMS + alignment over headers and supercells
    (``src/postprocess.py:404-440``)."""
    rows = structures["rows"]
    columns = structures["columns"]

    headers = filter_by_score(structures["headers"],
                              class_thresholds["table column header"])
    headers = greedy_nms(headers)
    headers = align_headers(headers, rows)

    plain = [sc for sc in structures["supercells"] if not sc["subheader"]]
    projected = [sc for sc in structures["supercells"] if sc["subheader"]]
    plain = filter_by_score(plain, class_thresholds["table spanning cell"])
    projected = filter_by_score(projected,
                                class_thresholds["table projected row header"])
    supercells = plain + projected
    # align before NMS: alignment snaps supercells onto the grid first,
    # so remaining overlap is resolved on grid coordinates
    supercells = align_supercells(supercells, rows, columns)
    supercells = nms_supercells(supercells)

    header_supercell_tree(supercells)

    structures["rows"] = rows
    structures["columns"] = columns
    structures["headers"] = headers
    structures["supercells"] = supercells
    return structures


def build_table_structures(table_object, objects_in_table, tokens_in_table,
                           class_thresholds):
    """Model objects → consistent {rows, columns, headers, supercells}
    (``src/postprocess.py:83-144``).  Labels are strings here (the
    reference routes int labels through a class-name list).
    """
    rows = [o for o in objects_in_table if o["label"] == "table row"]
    columns = [o for o in objects_in_table if o["label"] == "table column"]
    headers = [o for o in objects_in_table if o["label"] == "table column header"]
    supercells = [o for o in objects_in_table if o["label"] == "table spanning cell"]
    for sc in supercells:
        sc["subheader"] = False
    projected = [o for o in objects_in_table
                 if o["label"] == "table projected row header"]
    for sc in projected:
        sc["subheader"] = True
    supercells += projected

    for row in rows:
        row["header"] = any(iob(row["bbox"], h["bbox"]) >= 0.5 for h in headers)

    rows = refine_rows(rows, tokens_in_table, class_thresholds["table row"])
    columns = refine_columns(columns, tokens_in_table,
                             class_thresholds["table column"])

    # shrink the table bbox to the hull of the surviving rows/columns
    row_hull = Box()
    for row in rows:
        row_hull.include_rect(row["bbox"])
    col_hull = Box()
    for col in columns:
        col_hull.include_rect(col["bbox"])
    table_object["row_column_bbox"] = [col_hull[0], row_hull[1],
                                       col_hull[2], row_hull[3]]
    table_object["bbox"] = table_object["row_column_bbox"]

    columns = align_columns(columns, table_object["row_column_bbox"])
    rows = align_rows(rows, table_object["row_column_bbox"])

    structures = {"rows": rows, "columns": columns,
                  "headers": headers, "supercells": supercells}

    if len(rows) > 0 and len(columns) > 1:
        structures = _refine_structures(table_object["bbox"], structures,
                                        tokens_in_table, class_thresholds)

    return structures


# --------------------------------------------------------------------------
# cells (src/postprocess.py:692-843)
# --------------------------------------------------------------------------

def _hull(boxes):
    """Hull with fitz ``include_rect`` semantics: empty members are
    skipped; no members → the empty box (0, 0, 0, 0)."""
    x0 = y0 = x1 = y1 = None
    for b in boxes:
        if b[0] >= b[2] or b[1] >= b[3]:
            continue
        if x0 is None:
            x0, y0, x1, y1 = b[0], b[1], b[2], b[3]
        else:
            if b[0] < x0:
                x0 = b[0]
            if b[1] < y0:
                y0 = b[1]
            if b[2] > x1:
                x1 = b[2]
            if b[3] > y1:
                y1 = b[3]
    return (0.0, 0.0, 0.0, 0.0) if x0 is None else (x0, y0, x1, y1)


def _intersect_fitz(a, b):
    """``Box(a).intersect(b)`` as tuple math: an empty *b* replaces *a*,
    an empty *a* is kept, otherwise componentwise max/min."""
    if b[0] >= b[2] or b[1] >= b[3]:
        return (b[0], b[1], b[2], b[3])
    if a[0] >= a[2] or a[1] >= a[3]:
        return (a[0], a[1], a[2], a[3])
    return (max(a[0], b[0]), max(a[1], b[1]),
            min(a[2], b[2]), min(a[3], b[3]))


def structures_to_cells(structures, table_spans):
    """Canonical cell grid + confidence from refined structures
    (``src/postprocess.py:692-843``).

    Cell construction order is column-major (outer loop over columns),
    matching the reference — this order feeds the slotting tie-breaks and
    the output cell sequence.
    """
    columns = structures["columns"]
    rows = structures["rows"]
    supercells = structures["supercells"]
    cells, subcells = [], []

    # grid construction, vectorized over the (column × row) lattice.
    # The reference builds each grid cell as Box(row).intersect(col)
    # in column-major order; broadcasting reproduces that including the
    # fitz empty-box rules (empty col replaces, empty row is kept).
    n_rows, n_cols = len(rows), len(columns)
    rb = np.asarray([r["bbox"] for r in rows],
                    dtype=float).reshape(-1, 4)                  # (R, 4)
    cb = np.asarray([c["bbox"] for c in columns],
                    dtype=float).reshape(-1, 4)                  # (C, 4)
    grid = np.empty((n_cols, n_rows, 4))
    np.maximum(rb[None, :, :2], cb[:, None, :2], out=grid[:, :, :2])
    np.minimum(rb[None, :, 2:], cb[:, None, 2:], out=grid[:, :, 2:])
    col_empty = (cb[:, 0] >= cb[:, 2]) | (cb[:, 1] >= cb[:, 3])
    row_empty = (rb[:, 0] >= rb[:, 2]) | (rb[:, 1] >= rb[:, 3])
    if col_empty.any() or row_empty.any():
        grid = np.where(col_empty[:, None, None], cb[:, None, :],
                        np.where(row_empty[None, :, None],
                                 rb[None, :, :], grid))
    flat = grid.reshape(-1, 4)           # index c * n_rows + r (col-major)
    grid_areas = np_box_area(flat)

    # supercell coverage: > 0.5 of a grid cell's area inside any supercell
    if supercells:
        sc_boxes = np.asarray([sc["bbox"] for sc in supercells], dtype=float)
        inter = np_pairwise_intersection(flat, sc_boxes)
        frac = np.divide(inter, grid_areas[:, None],
                         out=np.zeros_like(inter),
                         where=grid_areas[:, None] > 0.0)
        covered_mask = (frac > 0.5).any(axis=1)
    else:
        covered_mask = np.zeros(len(flat), dtype=bool)

    row_headers = [bool(r.get("header")) for r in rows]
    grid_lists = flat.tolist()
    for idx, (bbox, covered) in enumerate(zip(grid_lists, covered_mask)):
        col_num, row_num = divmod(idx, n_rows)  # col-major flat index
        cell = {
            "bbox": bbox,
            "column_nums": [col_num],
            "row_nums": [row_num],
            "header": row_headers[row_num],
        }
        if covered:
            subcells.append(cell)
        else:
            cell["subheader"] = False
            cells.append(cell)

    # supercell merge: adopt every subcell with > 0.5 of its area inside
    # the supercell; the hull over those (all non-empty by the area
    # guard) is an order-independent componentwise min/max, so the
    # reference's sequential include_rect chain vectorizes exactly.
    if supercells and subcells:
        sub_boxes = np.asarray([s["bbox"] for s in subcells], dtype=float)
        sub_areas = np_box_area(sub_boxes)
        inter = np_pairwise_intersection(sub_boxes, sc_boxes)
        frac = np.divide(inter, sub_areas[:, None],
                         out=np.zeros_like(inter),
                         where=sub_areas[:, None] > 0.0)
        sel = (sub_areas[:, None] > 0.0) & (frac > 0.5)
        for j, sc in enumerate(supercells):
            idxs = np.nonzero(sel[:, j])[0]
            if idxs.size == 0:
                continue
            chosen = sub_boxes[idxs]
            merged_rows, merged_cols = set(), set()
            header = True
            for i in idxs:
                sub = subcells[i]
                merged_rows |= set(sub["row_nums"])
                merged_cols |= set(sub["column_nums"])
                # a supercell is a header cell only if *all* merged
                # subcells are header cells (rectangular header region)
                header = header and sub["header"]
            cells.append({
                "bbox": [float(chosen[:, 0].min()), float(chosen[:, 1].min()),
                         float(chosen[:, 2].max()), float(chosen[:, 3].max())],
                "column_nums": sorted(merged_cols),
                "row_nums": sorted(merged_rows),
                "header": header,
                "subheader": bool(sc["subheader"]),
            })

    # confidence = (mean + min)/2 of each token's best containment
    # fraction (src/postprocess.py:759-767)
    _, _, match_scores = slot_into_containers(cells, table_spans)
    if match_scores:
        confidence = (sum(match_scores) / len(match_scores)
                      + min(match_scores)) / 2
    else:
        confidence = 0

    # dilate every cell bbox to (hull of its columns) ∩ (hull of its rows)
    # (tuple math instead of Box objects: this and the text-fit loop below
    # accounted for ~100k Rect constructions per page batch)
    for cell in cells:
        col_hull = _hull(columns[c]["bbox"] for c in cell["column_nums"])
        row_hull = _hull(rows[r]["bbox"] for r in cell["row_nums"])
        cell["bbox"] = list(_intersect_fitz(col_hull, row_hull))

    # final token→cell assignment at a near-zero threshold
    spans_by_cell, _, _ = slot_into_containers(
        cells, table_spans, overlap_threshold=0.001,
        unique_assignment=True, forced_assignment=False)
    for cell, span_nums in zip(cells, spans_by_cell):
        cell_spans = [table_spans[i] for i in span_nums]
        cell["cell_text"] = assemble_text(cell_spans,
                                          remove_integer_superscripts=False)
        cell["spans"] = cell_spans

    # re-fit row/column/cell boxes to the extracted text extents
    # (src/postprocess.py:794-841)
    num_rows = len(rows)
    rows = order_top_to_bottom(rows)
    num_cols = len(columns)
    columns = order_left_to_right(columns)
    min_y_by_row, max_y_by_row = {}, {}
    min_x_by_col, max_x_by_col = {}, {}
    for cell in cells:
        r_lo, r_hi = min(cell["row_nums"]), max(cell["row_nums"])
        c_lo, c_hi = min(cell["column_nums"]), max(cell["column_nums"])
        for span in cell["spans"]:
            min_x_by_col.setdefault(c_lo, []).append(span["bbox"][0])
            min_y_by_row.setdefault(r_lo, []).append(span["bbox"][1])
            max_x_by_col.setdefault(c_hi, []).append(span["bbox"][2])
            max_y_by_row.setdefault(r_hi, []).append(span["bbox"][3])
    for row_num, row in enumerate(rows):
        if min_x_by_col.get(0):
            row["bbox"][0] = min(min_x_by_col[0])
        if min_y_by_row.get(row_num):
            row["bbox"][1] = min(min_y_by_row[row_num])
        if max_x_by_col.get(num_cols - 1):
            row["bbox"][2] = max(max_x_by_col[num_cols - 1])
        if max_y_by_row.get(row_num):
            row["bbox"][3] = max(max_y_by_row[row_num])
    for col_num, col in enumerate(columns):
        if min_x_by_col.get(col_num):
            col["bbox"][0] = min(min_x_by_col[col_num])
        if min_y_by_row.get(0):
            col["bbox"][1] = min(min_y_by_row[0])
        if max_x_by_col.get(col_num):
            col["bbox"][2] = max(max_x_by_col[col_num])
        if max_y_by_row.get(num_rows - 1):
            col["bbox"][3] = max(max_y_by_row[num_rows - 1])
    for cell in cells:
        row_hull = _hull(rows[r]["bbox"] for r in cell["row_nums"])
        col_hull = _hull(columns[c]["bbox"] for c in cell["column_nums"])
        fitted = _intersect_fitz(row_hull, col_hull)
        if (fitted[2] - fitted[0]) > 0 and (fitted[3] - fitted[1]) > 0:
            cell["bbox"] = list(fitted)

    return cells, confidence


def objects_to_cells(table, objects_in_table, tokens_in_table,
                     class_thresholds, copy_inputs: bool = True):
    """Entry point: model objects + tokens → (structures, cells,
    confidence) with a ≥1-row/≥1-column validity gate
    (``src/postprocess.py:61-80``).

    The reference mutates its inputs (token bboxes, object dicts); we
    deep-copy by default so the kernel is a pure function over Arrow
    batches.
    """
    if copy_inputs:
        table = copy.deepcopy(table)
        objects_in_table = copy.deepcopy(objects_in_table)
        tokens_in_table = copy.deepcopy(tokens_in_table)

    structures = build_table_structures(table, objects_in_table,
                                        tokens_in_table, class_thresholds)
    if len(structures["columns"]) < 1 or len(structures["rows"]) < 1:
        return structures, [], 0
    cells, confidence = structures_to_cells(structures, tokens_in_table)
    return structures, cells, confidence
