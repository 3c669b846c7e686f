"""Full table/caption location fan-out + per-row/col bbox aggregation.

Re-expresses the PubMed corpus-construction chain that anchors an XML
table annotation to PDF page coordinates:

* ``locate_table`` (``scripts/process_pubmed.py:490-569``): char-level
  alignment of the page text against the concatenated cell texts, a
  per-character source map on both sides (page char → word index,
  table char → cell index), matched chars vote words into cells, and
  each cell's bbox is the hull of its voted words.
* ``locate_caption`` (``scripts/process_pubmed.py:572-620``): same
  alignment against the caption string; returns one hull.
* ``aggregate_cell_bboxes`` (``scripts/process_pubmed.py:890-1018``):
  cell hulls → per-row/per-column boundary boxes (rotation-aware) →
  expanded per-cell boxes snapped to the row/col grid.

Reference quirks preserved (and unit-tested):

* ``if word_num:`` filters — word index **0** is excluded from inliers
  and cell hulls exactly like the reference's falsy check.
* ``aggregate_cell_bboxes`` grows a boundary with ``if bbox[k]:`` — a
  coordinate of exactly ``0.0`` is treated as unset (falsy) and gets
  overwritten rather than min/maxed.
* row/col boxes for rows/cols touched only by bbox-less cells keep
  ``None`` in their free coordinates (the reference leaves them
  half-initialized; only the table-extent coordinates are filled).
"""

from __future__ import annotations

from .alignment import align_chars

__all__ = [
    "locate_table",
    "locate_caption",
    "aggregate_cell_bboxes",
]

# locate-phase alignment parameters (process_pubmed.py:513-517)
_LOCATE_ALIGN_KW = dict(match_reward=3, mismatch_penalty=-2,
                        new_gap_penalty=-10, continue_gap_penalty=-0.05,
                        page_boundary_gap_reward=0.2, gap_character="~")


def _char_source_map(texts):
    """Per-character source index for ``" ".join(texts)``: each char of
    ``texts[i]`` maps to ``i``; the joining spaces map to ``None``
    (reference's ``page_text_source`` / ``table_text_source``
    construction, trailing separator dropped)."""
    src = []
    for num, t in enumerate(texts):
        src.extend([num] * len(t))
        src.append(None)
    return src[:-1] if src else src


def locate_table(page_words, cells):
    """Anchor *cells* (``{"xml_text_content": str}`` records) to
    *page_words* (``{"text", "bbox"}`` in reading order).

    Returns ``(cell_bboxes, inlier_word_idxs)`` — ``cell_bboxes`` maps
    every cell index to a hull ``[x0, y0, x1, y1]`` or ``None``;
    ``(None, None)`` when nothing anchors
    (``scripts/process_pubmed.py:490-569``)."""
    page_texts = [w["text"] for w in page_words]
    page_text = " ".join(page_texts)
    page_src = _char_source_map(page_texts)

    cell_texts = [c["xml_text_content"].strip() for c in cells]
    table_text = " ".join(cell_texts)
    table_src = _char_source_map(cell_texts)

    (a_page, a_table), _ = align_chars(
        page_text.replace("~", "^"), table_text.replace("~", "^"),
        score_only=False, **_LOCATE_ALIGN_KW)

    table_words = set()
    cell_words: dict[int, set] = {}
    pi = ti = 0
    for c1, c2 in zip(a_page, a_table):
        if c1 != "~":
            if c1 == c2:
                table_words.add(page_src[pi])
                cell_num = table_src[ti]
                if cell_num is not None:
                    cell_words.setdefault(cell_num, set()).add(page_src[pi])
            pi += 1
        if c2 != "~":
            ti += 1

    # reference quirk: `if word_num:` drops None AND word index 0
    inliers = [w for w in table_words if w]
    if not inliers:
        return None, None

    cell_bboxes = {}
    for cell_num in range(len(cells)):
        bbox = None
        for word_num in cell_words.get(cell_num, ()):
            if not word_num:
                continue
            wb = page_words[word_num]["bbox"]
            if bbox is None:
                bbox = list(wb[:4])
            else:
                bbox = [min(bbox[0], wb[0]), min(bbox[1], wb[1]),
                        max(bbox[2], wb[2]), max(bbox[3], wb[3])]
        cell_bboxes[cell_num] = bbox
    return cell_bboxes, sorted(inliers)


def locate_caption(page_words, caption):
    """Hull of the page words matching *caption*; ``([], [])`` when
    nothing anchors (``scripts/process_pubmed.py:572-620``)."""
    page_texts = [w["text"] for w in page_words]
    page_text = " ".join(page_texts)
    page_src = _char_source_map(page_texts)

    (a_page, a_table), _ = align_chars(
        page_text.replace("~", "^"), caption.replace("~", "^"),
        score_only=False, **_LOCATE_ALIGN_KW)

    matching = set()
    pi = 0
    for c1, c2 in zip(a_page, a_table):
        if c1 != "~":
            if c1 == c2:
                matching.add(page_src[pi])
            pi += 1

    inliers = sorted(w for w in matching if w)  # falsy quirk: drops 0
    if not inliers:
        return [], []

    bbox = list(page_words[inliers[0]]["bbox"][:4])
    for idx in inliers[1:]:
        wb = page_words[idx]["bbox"]
        bbox = [min(bbox[0], wb[0]), min(bbox[1], wb[1]),
                max(bbox[2], wb[2]), max(bbox[3], wb[3])]
    return bbox, inliers


def _grow(slot, k, value, fn):
    # reference's falsy-guarded min/max: a stored 0.0 counts as unset
    slot[k] = fn(slot[k], value) if slot[k] else value


def aggregate_cell_bboxes(cells, cell_bboxes, rotated=False,
                          portrait_fn=None):
    """Cell hulls → (table_bbox, col_bboxes, row_bboxes,
    expanded_cell_bboxes) (``scripts/process_pubmed.py:890-1018``).

    *cells* carry ``row_nums``/``column_nums``; *cell_bboxes* maps cell
    index → hull or ``None``.  When *portrait_fn* is given it decides
    page orientation from the table bbox (the reference's
    ``is_portrait(page, table_bbox)``), overriding *rotated*.
    Returns ``(None, {}, {}, {})`` when no cell has a bbox (the
    reference would raise; callers skip those tables)."""
    table_bbox = None
    for cell_num in range(len(cells)):
        bbox = cell_bboxes.get(cell_num)
        if not bbox:
            continue
        if table_bbox is None:
            table_bbox = list(bbox)
        else:
            table_bbox = [min(table_bbox[0], bbox[0]),
                          min(table_bbox[1], bbox[1]),
                          max(table_bbox[2], bbox[2]),
                          max(table_bbox[3], bbox[3])]
    if table_bbox is None:
        return None, {}, {}, {}

    if portrait_fn is not None:
        rotated = not portrait_fn(table_bbox)

    row_bboxes: dict[int, list] = {}
    col_bboxes: dict[int, list] = {}
    for cell_num, cell in enumerate(cells):
        min_row, max_row = min(cell["row_nums"]), max(cell["row_nums"])
        min_col, max_col = min(cell["column_nums"]), max(cell["column_nums"])
        for r in (min_row, max_row):
            row_bboxes.setdefault(r, [None, None, None, None])
        for c in (min_col, max_col):
            col_bboxes.setdefault(c, [None, None, None, None])
        bbox = cell_bboxes.get(cell_num)
        if not bbox:
            continue
        if not rotated:
            _grow(col_bboxes[min_col], 0, bbox[0], min)
            _grow(row_bboxes[min_row], 1, bbox[1], min)
            _grow(col_bboxes[max_col], 2, bbox[2], max)
            _grow(row_bboxes[max_row], 3, bbox[3], max)
        else:
            _grow(col_bboxes[min_col], 1, bbox[1], min)
            _grow(row_bboxes[min_row], 0, bbox[0], min)
            _grow(col_bboxes[max_col], 3, bbox[3], max)
            _grow(row_bboxes[max_row], 2, bbox[2], max)

    # the cross-axis extents snap to the table bbox
    if not rotated:
        for rb in row_bboxes.values():
            rb[0], rb[2] = table_bbox[0], table_bbox[2]
        for cb in col_bboxes.values():
            cb[1], cb[3] = table_bbox[1], table_bbox[3]
    else:
        for rb in row_bboxes.values():
            rb[1], rb[3] = table_bbox[1], table_bbox[3]
        for cb in col_bboxes.values():
            cb[0], cb[2] = table_bbox[0], table_bbox[2]

    expanded = {}
    for cell_num, cell in enumerate(cells):
        min_row, max_row = min(cell["row_nums"]), max(cell["row_nums"])
        min_col, max_col = min(cell["column_nums"]), max(cell["column_nums"])
        if not rotated:
            expanded[cell_num] = [col_bboxes[min_col][0],
                                  row_bboxes[min_row][1],
                                  col_bboxes[max_col][2],
                                  row_bboxes[max_row][3]]
        else:
            expanded[cell_num] = [row_bboxes[min_row][0],
                                  col_bboxes[min_col][1],
                                  row_bboxes[max_row][2],
                                  col_bboxes[max_col][3]]
    return table_bbox, col_bboxes, row_bboxes, expanded
