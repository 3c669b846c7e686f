"""GriTS: grid table similarity metrics (per-table-pair kernel).

Reimplements the reference metric family (``src/grits.py``):
GriTS_Top (relative-span topology), GriTS_Loc (cell bbox IoU),
GriTS_Con (cell text LCS), all through the factored 2D-MSS
polynomial heuristic (``src/grits.py:166-214``) — DP sequence alignment
over precomputed pairwise rewards.

Differences in *shape*, not semantics, vs the reference: the inner 1D
alignment scores for every (true_row, pred_row) pair are computed once
into a matrix (the reference recomputes them per outer-DP cell with
identical results, ``src/grits.py:141-145``); tie-break order in the DP
(diag ≻ up ≻ left) is preserved exactly because it selects which
alignment the traceback reports.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

from ..geometry import iou

__all__ = [
    "fscore",
    "lcs_similarity",
    "cells_to_grid",
    "cells_to_relspan_grid",
    "grits_top",
    "grits_loc",
    "grits_con",
    "factored_2dmss",
]


def fscore(num_true_positives, num_true, num_positives):
    """F-score with the reference's empty-side conventions
    (``src/grits.py:13-36``): precision=1 with no predictions,
    recall=1 with no truth."""
    precision = num_true_positives / num_positives if num_positives > 0 else 1
    recall = num_true_positives / num_true if num_true > 0 else 1
    if precision + recall > 0:
        f = 2 * precision * recall / (precision + recall)
    else:
        f = 0
    return f, precision, recall


def lcs_similarity(s1: str, s2: str) -> float:
    """2·LCS/(len1+len2) via difflib matching blocks
    (``src/grits.py:217-222``)."""
    if len(s1) == 0 and len(s2) == 0:
        return 1
    m = SequenceMatcher(None, s1, s2)
    lcs_len = sum(block.size for block in m.get_matching_blocks())
    return 2 * lcs_len / (len(s1) + len(s2))


def _align_1d(reward: np.ndarray):
    """Needleman-Wunsch-style alignment over a (N, M) reward matrix.

    Returns (aligned_i, aligned_j, score).  Pointer preference on ties:
    diagonal, then up (skip seq1), then left (skip seq2) — matching
    ``src/grits.py:101-115``.
    """
    n, m = reward.shape
    scores = np.zeros((n + 1, m + 1))
    pointers = np.zeros((n + 1, m + 1), dtype=np.int8)
    pointers[1:, 0] = -1
    pointers[0, 1:] = 1
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            diag = scores[i - 1, j - 1] + reward[i - 1, j - 1]
            up = scores[i - 1, j]
            left = scores[i, j - 1]
            best = max(diag, up, left)
            scores[i, j] = best
            if diag == best:
                pointers[i, j] = 0
            elif up == best:
                pointers[i, j] = -1
            else:
                pointers[i, j] = 1

    ai, aj = [], []
    i, j = n, m
    while not (i == 0 and j == 0):
        p = pointers[i, j]
        if p == -1:
            i -= 1
        elif p == 1:
            j -= 1
        else:
            i -= 1
            j -= 1
            ai.append(i)
            aj.append(j)
    return ai[::-1], aj[::-1], scores[n, m]


def factored_2dmss(true_grid, pred_grid, reward_fn):
    """Factored two-dimensional most-similar-substructures
    (``src/grits.py:166-214``).

    1. precompute R[tr, tc, pr, pc] = reward(true[tr,tc], pred[pr,pc]);
    2. row axis: inner 1D alignment score per (tr, pr) over columns →
       outer alignment of rows;
    3. column axis: same on the transpose;
    4. positive match score over the (row, column) alignment product;
       upper bound from min(row_score, col_score).
    Returns (fscore, precision, recall, upper_bound).
    """
    # grids stay nested Python lists: entries are heterogeneous
    # (strings / 4-lists / 0 placeholders), so numpy object coercion
    # would mangle shapes
    tr = len(true_grid)
    tc = len(true_grid[0]) if tr else 0
    pr = len(pred_grid)
    pc = len(pred_grid[0]) if pr else 0
    num_true = tr * tc
    num_pos = pr * pc

    R = np.zeros((tr, tc, pr, pc))
    for a in range(tr):
        for b in range(tc):
            tv = true_grid[a][b]
            for c in range(pr):
                for d in range(pc):
                    R[a, b, c, d] = reward_fn(tv, pred_grid[c][d])

    # row axis: inner score over columns for each (true_row, pred_row)
    row_inner = np.zeros((tr, pr))
    for a in range(tr):
        for c in range(pr):
            row_inner[a, c] = _align_1d(R[a, :, c, :])[2]
    t_rows, p_rows, row_score = _align_1d(row_inner)

    # column axis on the transpose
    col_inner = np.zeros((tc, pc))
    for b in range(tc):
        for d in range(pc):
            col_inner[b, d] = _align_1d(R[:, b, :, d])[2]
    t_cols, p_cols, col_score = _align_1d(col_inner)

    # NOTE: argument order (tp, num_pos, num_true) replicates the
    # reference's upper-bound call at src/grits.py:203.
    upper_bound, _, _ = fscore(min(row_score, col_score), num_pos, num_true)

    match_score = 0.0
    for a, c in zip(t_rows, p_rows):
        for b, d in zip(t_cols, p_cols):
            match_score += R[a, b, c, d]

    f, precision, recall = fscore(match_score, num_true, num_pos)
    return f, precision, recall, upper_bound


# -- grid construction (src/grits.py:239-285) --------------------------------

def cells_to_grid(cells, key="cell_text"):
    """Cells → dense (rows × cols) matrix of a cell feature; positions
    not covered by any cell keep the 0 placeholder (reference
    ``np.zeros.tolist()`` init)."""
    if len(cells) == 0:
        return [[]]
    n_rows = max(max(c["row_nums"]) for c in cells) + 1
    n_cols = max(max(c["column_nums"]) for c in cells) + 1
    grid = [[0] * n_cols for _ in range(n_rows)]
    for cell in cells:
        for r in cell["row_nums"]:
            for c in cell["column_nums"]:
                grid[r][c] = cell[key]
    return grid


def cells_to_relspan_grid(cells):
    """Cells → matrix of relative-span boxes (GriTS_Top feature,
    ``src/grits.py:261-285``): for the cell covering grid position
    (i, j), the entry is [min_col-j, min_row-i, max_col+1-j,
    max_row+1-i] — always [0,0,1,1] for a non-spanning cell."""
    if len(cells) == 0:
        return [[]]
    n_rows = max(max(c["row_nums"]) for c in cells) + 1
    n_cols = max(max(c["column_nums"]) for c in cells) + 1
    grid = [[0] * n_cols for _ in range(n_rows)]
    for cell in cells:
        r0, r1 = min(cell["row_nums"]), max(cell["row_nums"]) + 1
        c0, c1 = min(cell["column_nums"]), max(cell["column_nums"]) + 1
        for r in cell["row_nums"]:
            for c in cell["column_nums"]:
                grid[r][c] = [c0 - c, r0 - r, c1 - c, r1 - r]
    return grid


def _iou_reward(a, b):
    # uncovered grid positions hold the scalar 0 placeholder; the
    # reference would crash on those (Rect(0)) — treat as no reward
    if not isinstance(a, (list, tuple)) or not isinstance(b, (list, tuple)):
        return 0.0
    return iou(a, b)


def _text_reward(a, b):
    return lcs_similarity("" if a == 0 else a, "" if b == 0 else b)


def grits_top(true_cells, pred_cells):
    """GriTS_Top over relative-span grids (``src/grits.py:373-388``)."""
    return factored_2dmss(cells_to_relspan_grid(true_cells),
                          cells_to_relspan_grid(pred_cells),
                          _iou_reward)


def grits_loc(true_cells, pred_cells):
    """GriTS_Loc over cell-bbox grids (``src/grits.py:391-397``)."""
    return factored_2dmss(cells_to_grid(true_cells, key="bbox"),
                          cells_to_grid(pred_cells, key="bbox"),
                          _iou_reward)


def grits_con(true_cells, pred_cells):
    """GriTS_Con over cell-text grids (``src/grits.py:400-406``)."""
    return factored_2dmss(cells_to_grid(true_cells, key="cell_text"),
                          cells_to_grid(pred_cells, key="cell_text"),
                          _text_reward)


def spanning_cell_grid_matches(spanning_cells, rows, columns):
    """Which grid (row, col) positions each spanning cell owns, first
    claim wins (``src/grits.py:288-337``): a row/column matches when the
    spanning cell covers ≥50% of the strip formed by intersecting its
    extent with that row/column; cells whose positions are already taken
    get no matches; matched spanning cells snap to the row/column hulls.
    """
    from ..geometry import Box, box_area, box_intersect

    matches_by_cell = []
    taken = set()
    for sc in spanning_cells:
        row_hits, col_hits = set(), set()
        for r_num, row in enumerate(rows):
            strip = [sc["bbox"][0], row["bbox"][1],
                     sc["bbox"][2], row["bbox"][3]]
            sa = box_area(strip)
            if sa > 0 and box_area(box_intersect(sc["bbox"], strip)) / sa >= 0.5:
                row_hits.add(r_num)
        for c_num, col in enumerate(columns):
            strip = [col["bbox"][0], sc["bbox"][1],
                     col["bbox"][2], sc["bbox"][3]]
            sa = box_area(strip)
            if sa > 0 and box_area(box_intersect(sc["bbox"], strip)) / sa >= 0.5:
                col_hits.add(c_num)
        this = [(r, c) for r in row_hits for c in col_hits]
        if any(pos in taken for pos in this):
            matches_by_cell.append([])
            continue
        taken.update(this)
        matches_by_cell.append(this)
        if this:
            row_hull, col_hull = Box(), Box()
            for r, _ in this:
                row_hull.include_rect(rows[r]["bbox"])
            for _, c in this:
                col_hull.include_rect(columns[c]["bbox"])
            sc["bbox"] = row_hull.intersect(col_hull).tolist()
    return matches_by_cell


def raw_output_to_bbox_grid(objects):
    """GriTS_RawLoc grid from unprocessed (dilated) model boxes
    (``src/grits.py:340-370``): rows × columns intersections, spanning
    cells overriding the positions they claim.  Objects are
    {label, score, bbox} with string labels."""
    from ..geometry import Box

    rows = [{"bbox": o["bbox"]} for o in objects if o["label"] == "table row"]
    columns = [{"bbox": o["bbox"]} for o in objects
               if o["label"] == "table column"]
    spanning = [{"bbox": o["bbox"], "score": o.get("score", 1)}
                for o in objects
                if o["label"] in ("table spanning cell",
                                  "table projected row header")]
    rows.sort(key=lambda x: x["bbox"][1] + x["bbox"][3])
    columns.sort(key=lambda x: x["bbox"][0] + x["bbox"][2])
    spanning.sort(key=lambda x: -x["score"])

    grid = [[Box(r["bbox"]).intersect(c["bbox"]).tolist() for c in columns]
            for r in rows]
    for matches, sc in zip(
            spanning_cell_grid_matches(spanning, rows, columns), spanning):
        for r, c in matches:
            grid[r][c] = sc["bbox"]
    return grid


def grits_rawloc(true_objects, pred_objects):
    """GriTS_RawLoc: location similarity on raw (dilated) boxes
    (``src/eval.py:311-321``)."""
    return factored_2dmss(raw_output_to_bbox_grid(true_objects),
                          raw_output_to_bbox_grid(pred_objects),
                          _iou_reward)


def grits_from_html(true_html: str, pred_html: str) -> dict:
    """GriTS_Top + GriTS_Con for two HTML table strings
    (``src/grits.py:466-497``): parse both sides with the occupancy
    parser, then score topology and content grids."""
    from ..operators.export import html_to_cells

    true_cells = html_to_cells(true_html)
    pred_cells = html_to_cells(pred_html)

    metrics = {}
    (metrics["grits_top"], metrics["grits_precision_top"],
     metrics["grits_recall_top"],
     metrics["grits_top_upper_bound"]) = grits_top(true_cells, pred_cells)
    (metrics["grits_con"], metrics["grits_precision_con"],
     metrics["grits_recall_con"],
     metrics["grits_con_upper_bound"]) = grits_con(true_cells, pred_cells)
    return metrics
