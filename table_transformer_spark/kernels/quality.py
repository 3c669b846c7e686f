"""Data-quality gates for corpus construction (the ETL's tests-as-gates,
SURVEY.md §5).

Re-expresses the FinTabNet QC operators
(``scripts/process_fintabnet.py:841-902``):

* **word coverage** — every word ≥50% inside the table must be ≥90%
  covered by its best cell on average, else "poor text cell fit";
* **structure validity** — adjacent rows/columns may not overlap by
  more than 1pt, else "rows intersect"/"columns intersect";
* **edit-distance agreement** — mean normalized Levenshtein distance
  between two text sources per cell must be ≤0.05, else "text
  annotation quality" (the PubMed gate at
  ``scripts/process_pubmed.py:1602-1608`` uses the same D).

``editdistance`` isn't available here, so Levenshtein is implemented
inline (two-row DP).  Reject reasons append to the table's ``reject``
list exactly like the reference, and feed the status table.
"""

from __future__ import annotations

from ..geometry import box_area, box_intersect

__all__ = [
    "levenshtein",
    "table_text_edit_distance",
    "check_word_coverage",
    "check_structure_validity",
    "strip_markup_tags",
    "is_portrait",
]


def _containment(b1, b2) -> float:
    """Fraction of b1 inside b2; degenerate b1 counts as fully covered
    (the reference's except→1 at scripts/process_fintabnet.py:841-845)."""
    a1 = box_area(b1)
    if a1 <= 0:
        return 1.0
    return box_area(box_intersect(b1, b2)) / a1


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def table_text_edit_distance(cells, key_a: str = "text",
                             key_b: str = "pdf_text") -> float:
    """Mean normalized edit distance between two text sources per cell,
    spaces removed and trailing periods stripped
    (``scripts/process_fintabnet.py:847-860``)."""
    if not cells:
        return 0
    total = 0.0
    for cell in cells:
        a = "".join(cell[key_a].split()).strip(".")
        b = "".join(cell[key_b].split()).strip(".")
        longest = max(len(a), len(b))
        if longest > 0:
            total += levenshtein(a, b) / longest
    return total / len(cells)


def check_word_coverage(table, page_words, threshold: float = 0.9):
    """Mean best-cell containment of the table's words must reach the
    threshold (``quality_control1``, scripts/process_fintabnet.py:
    862-873).  Words are (bbox, text) pairs; '.'-only words skipped."""
    overlaps = []
    table_bbox = table["bbox"]
    for bbox, text in page_words:
        if text == ".":
            continue
        if _containment(bbox, table_bbox) < 0.5:
            continue
        overlaps.append(max(
            (_containment(bbox, cell["bbox"]) for cell in table["cells"]),
            default=0.0))
    if overlaps and sum(overlaps) / len(overlaps) < threshold:
        table["reject"].append("poor text cell fit")


def check_structure_validity(table, edit_distance_cells=None,
                             max_edit_distance: float = 0.05):
    """Adjacent rows/columns must not overlap by >1pt; optional text
    agreement gate (``quality_control2``,
    scripts/process_fintabnet.py:875-890)."""
    rows = table["rows"]
    for r in rows:
        if r + 1 in rows and "bbox" in rows[r]:
            if rows[r]["bbox"][3] > rows[r + 1]["bbox"][1] + 1:
                table["reject"].append("rows intersect")
    cols = table["columns"]
    for c in cols:
        if c + 1 in cols and "bbox" in cols[c]:
            if cols[c]["bbox"][2] > cols[c + 1]["bbox"][0] + 1:
                table["reject"].append("columns intersect")

    if edit_distance_cells is not None:
        if table_text_edit_distance(edit_distance_cells) > max_edit_distance:
            table["reject"].append("text annotation quality")


def is_portrait(lines, bbox=None) -> bool:
    """Majority vote of text-line writing directions inside *bbox*
    (``scripts/process_pubmed.py:623-641``): a line fully inside the
    region votes portrait when its direction is (1, 0) and landscape
    when (0, -1); ties go to portrait.  *lines* are
    ``{"bbox": [...], "dir": (dx, dy)}`` records (the PDF reader's
    line metadata)."""
    portrait = landscape = 0
    for line in lines:
        lb = line["bbox"]
        if bbox is not None and not (
                lb[0] >= bbox[0] and lb[1] >= bbox[1]
                and lb[2] <= bbox[2] and lb[3] <= bbox[3]):
            continue
        dx, dy = line["dir"]
        if dx == 1 and dy == 0:
            portrait += 1
        elif dx == 0 and dy == -1:
            landscape += 1
    return portrait >= landscape


def strip_markup_tags(cells, key: str = "text"):
    """Strip inline <i>/<sup>/<sub> markup
    (``remove_html_tags_in_text``, scripts/process_fintabnet.py:893-902;
    DataFrame twin: regexp_replace)."""
    for cell in cells:
        t = cell[key]
        for tag in ("<i>", "</i>", "<sup>", "</sup>", "<sub>", "</sub>"):
            t = t.replace(tag, " ")
        cell[key] = t.replace("  ", " ").strip()
    return cells
