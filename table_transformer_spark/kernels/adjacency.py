"""Directed adjacency relations (DAR) kernels.

Per-cell nearest-nonblank-neighbor relations and the multiset
intersection F-score over them (reference ``src/eval.py:83-263``).
Kept as per-table kernels for parity (the windowed DataFrame form of the
multiset intersection is oracle-checked in driver_queries).
"""

from __future__ import annotations

from collections import Counter

from .grits import fscore

__all__ = ["adjacency_pairs", "adjacency_pairs_with_blanks", "dar_con"]


def _grid_index(cells):
    by_coord = {}
    rows, cols = set(), set()
    for num, cell in enumerate(cells):
        for r in cell["row_nums"]:
            rows.add(r)
            for c in cell["column_nums"]:
                by_coord[(r, c)] = num
        for c in cell["column_nums"]:
            cols.add(c)
    return by_coord, len(rows), len(cols)


def adjacency_pairs(cells):
    """Directed (text1, text2, 'H'|'V', gap) tuples: first non-blank
    cell to the right / below, per occupied row/column
    (``src/eval.py:83-155``). Blank source cells skipped."""
    by_coord, n_rows, n_cols = _grid_index(cells)
    out = []
    for cell in cells:
        if cell["cell_text"] == "":
            continue
        found = {}
        max_row = max(cell["row_nums"])
        max_col = max(cell["column_nums"])
        for c in cell["column_nums"]:
            for r in range(max_row + 1, n_rows):
                other = cells[by_coord[(r, c)]]
                if other["cell_text"] != "":
                    found[by_coord[(r, c)]] = ("V", r - max_row - 1)
                    break
        for r in cell["row_nums"]:
            for c in range(max_col + 1, n_cols):
                other = cells[by_coord[(r, c)]]
                if other["cell_text"] != "":
                    found[by_coord[(r, c)]] = ("H", c - max_col - 1)
                    break
        for num, (direction, gap) in found.items():
            out.append((cell["cell_text"], cells[num]["cell_text"],
                        direction, gap))
    return out


def adjacency_pairs_with_blanks(cells):
    """DAR variant where blank neighbors count
    (``src/eval.py:158-222``)."""
    by_coord, n_rows, n_cols = _grid_index(cells)
    out = []
    for cell in cells:
        found = {}
        max_row = max(cell["row_nums"])
        max_col = max(cell["column_nums"])
        for c in cell["column_nums"]:
            if max_row + 1 < n_rows:
                found[by_coord[(max_row + 1, c)]] = ("V", 0)
        for r in cell["row_nums"]:
            if max_col + 1 < n_cols:
                found[by_coord[(r, max_col + 1)]] = ("H", 0)
        for num, (direction, gap) in found.items():
            out.append((cell["cell_text"], cells[num]["cell_text"],
                        direction, gap))
    return out


def dar_con(true_adjacencies, pred_adjacencies):
    """Multiset-intersection F-score over adjacency tuples
    (``src/eval.py:225-243``).  Returns (recall, precision, fscore) in
    the reference's order."""
    tc = Counter(true_adjacencies)
    pc = Counter(pred_adjacencies)
    tp = sum(tc.values()) - sum((tc - pc).values())
    f, precision, recall = fscore(tp, len(true_adjacencies),
                                  len(pred_adjacencies))
    return recall, precision, f
