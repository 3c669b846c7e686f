"""FinTabNet entry scan + create_table_dict validity checks
(reference: scripts/process_fintabnet.py:118-162, 1111-1142)."""

import json

import pytest

from table_transformer_spark.operators.fintabnet import (
    create_table_dict,
    fintabnet_jsonl_scan,
)

HTML_2X2 = ("<table><tr><td>A</td><td>B</td></tr>"
            "<tr><td>C</td><td>D</td></tr></table>")


def _record(filename, table_id, html, n_cells, split="val"):
    return {
        "filename": filename, "table_id": table_id, "split": split,
        "html": {
            "structure": {"tokens": [html]},
            "cells": [{"tokens": [f"c{i}"],
                       "bbox": [float(i), 0.0, float(i) + 1.0, 1.0]}
                      for i in range(n_cells)],
        },
    }


@pytest.fixture()
def jsonl_path(tmp_path):
    recs = [
        _record("docs/AAA/page_1.pdf", 7, HTML_2X2, 4),
        _record("docs/BBB/page_2.pdf", 3, HTML_2X2, 4),
        _record("docs/AAA/page_1.pdf", 9, HTML_2X2, 4),
    ]
    p = tmp_path / "FinTabNet_1.0.0_cell_val.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    return str(p)


def test_scan_line_order_and_table_index(spark, jsonl_path):
    rows = (fintabnet_jsonl_scan(spark, jsonl_path)
            .orderBy("line_idx").collect())
    assert [r.line_idx for r in rows] == [0, 1, 2]
    assert [r.document_id for r in rows] == [
        "docs_AAA_page_1", "docs_BBB_page_2", "docs_AAA_page_1"]
    # per-document table index in file order (file_idx_to_table_idx)
    assert [r.document_table_index for r in rows] == [0, 0, 1]
    assert rows[0].table_id == 7 and rows[2].table_id == 9
    assert rows[0].structure_html == HTML_2X2
    assert [list(c["tokens"]) for c in rows[0].pdf_cells] == [
        ["c0"], ["c1"], ["c2"], ["c3"]]


def test_scan_feeds_create_table_dict(spark, jsonl_path):
    row = (fintabnet_jsonl_scan(spark, jsonl_path)
           .orderBy("line_idx").limit(1).collect()[0])
    table = create_table_dict(
        row.structure_html,
        [{"tokens": list(c["tokens"]), "bbox": list(c["bbox"])}
         for c in row.pdf_cells])
    assert table["reject"] == []
    assert len(table["cells"]) == 4
    assert table["cells"][0]["text"] == "c0"
    assert table["cells"][0]["bbox"] == [0.0, 0.0, 1.0, 1.0]
    assert sorted(table["rows"]) == [0, 1]
    assert sorted(table["columns"]) == [0, 1]


def test_create_table_dict_rejects():
    # annotation mismatch: 4 HTML cells, 3 pdf cells
    t = create_table_dict(HTML_2X2, [{"tokens": ["x"], "bbox": None}] * 3)
    assert "annotation mismatch" in t["reject"]
    # missing grid cells: 2x2 grid with only 3 cells
    missing = ("<table><tr><td>A</td><td>B</td></tr>"
               "<tr><td>C</td></tr></table>")
    t = create_table_dict(missing, [{"tokens": ["x"], "bbox": None}] * 3)
    assert t["reject"] == ["HTML missing grid cells"]
    # clean table → no rejects
    t = create_table_dict(HTML_2X2, [{"tokens": ["x"], "bbox": None}] * 4)
    assert t["reject"] == []


def test_extract_pdf_text_dot_leader_fix():
    from table_transformer_spark.kernels.canonicalize import (
        extract_pdf_text,
    )
    # cell grid covers a word plus a trailing dot-leader; the dots are
    # stripped (fix) and the tight bbox excludes them
    page_words = [{"text": "Revenue", "bbox": [0, 0, 50, 10]},
                  {"text": "......", "bbox": [55, 0, 90, 10]}]
    table = {"cells": [{"text": "", "row_nums": [0], "column_nums": [0],
                        "bbox": [0, 0, 90, 10],
                        "grid_bbox": [0, 0, 100, 10]}],
             "rows": {0: {}}, "columns": {0: {}}, "reject": [], "fix": []}
    adjusted = extract_pdf_text(table, page_words)
    cell = table["cells"][0]
    assert cell["pdf_text_content"] == "Revenue"
    assert cell["bbox"] == [0, 0, 50, 10]
    assert adjusted is True
    assert table["fix"] == ["removed dots from text cell"]
    assert table["reject"] == []


def test_fixpoint_converges_and_runaway_rejects():
    from table_transformer_spark.kernels.canonicalize import (
        extract_pdf_text_fixpoint,
    )
    page_words = [{"text": "aa", "bbox": [0, 0, 10, 10]},
                  {"text": "bb", "bbox": [20, 0, 30, 10]}]
    table = {"cells": [{"text": "", "row_nums": [0], "column_nums": [0],
                        "bbox": [1, 1, 9, 9]},
                       {"text": "", "row_nums": [0], "column_nums": [1],
                        "bbox": [21, 1, 29, 9]}],
             "rows": {0: {}}, "columns": {0: {}, 1: {}},
             "reject": [], "fix": []}
    iters = extract_pdf_text_fixpoint(table, page_words)
    assert iters == 2
    assert table["reject"] == []
    assert table["cells"][0]["bbox"] == [0, 0, 10, 10]
    assert table["cells"][0]["pdf_text_content"] == "aa"
    # max_iterations=0 exits immediately; the unresolved adjustment
    # is NOT flagged because the loop never ran (adjust stays True →
    # runaway); replicate the reference guard with max_iterations=1
    # on a table that needs 2 passes
    table2 = {"cells": [{"text": "", "row_nums": [0], "column_nums": [0],
                         "bbox": [1, 1, 9, 9]}],
              "rows": {0: {}}, "columns": {0: {}},
              "reject": [], "fix": []}
    iters2 = extract_pdf_text_fixpoint(table2, page_words[:1],
                                       max_iterations=1)
    assert iters2 == 1
    assert table2["reject"] == ["runaway text adjustment"]


def test_fixpoint_rejected_boundary_no_crash():
    from table_transformer_spark.kernels.canonicalize import (
        extract_pdf_text_fixpoint,
    )
    # second row's only cell has no tight bbox → complete_table_grid
    # rejects "undetermined row boundary"; the fixpoint must stop
    # gracefully instead of KeyError'ing on the missing grid_bbox
    page_words = [{"text": "aa", "bbox": [0, 0, 10, 10]}]
    table = {"cells": [{"text": "", "row_nums": [0], "column_nums": [0],
                        "bbox": [0, 0, 10, 10]},
                       {"text": "", "row_nums": [1], "column_nums": [0],
                        "bbox": None}],
             "rows": {0: {}, 1: {}}, "columns": {0: {}},
             "reject": [], "fix": []}
    iters = extract_pdf_text_fixpoint(table, page_words)
    assert iters == 0
    assert "undetermined row boundary" in table["reject"]


def test_scan_is_rdd_free_and_orders_multifile_globs(spark, tmp_path):
    """Line order must come from file-metadata columns (no RDD hop, no
    zipWithIndex count job), and a glob over several JSONLs must number
    lines per file — interleaved reads can never corrupt
    document_table_index."""
    import inspect
    import json

    src = inspect.getsource(fintabnet_jsonl_scan)
    assert ".rdd" not in src and "zipWithIndex" not in src

    def entry(doc, tid):
        return json.dumps({
            "filename": f"{doc}.pdf", "table_id": tid, "split": "train",
            "html": {"structure": {"tokens":
                     ["<table>", "<tr>", "<td>", "</td>", "</tr>",
                      "</table>"]},
                     "cells": [{"tokens": ["x"],
                                "bbox": [0.0, 0.0, 1.0, 1.0]}]}})

    d = tmp_path / "glob"
    d.mkdir()
    # same document appears in one file only; several tables per doc
    (d / "a.jsonl").write_text("\n".join(
        [entry("docA", 1), entry("docA", 2), entry("docB", 7)]))
    (d / "b.jsonl").write_text("\n".join(
        [entry("docC", 3), entry("docC", 4), entry("docC", 5)]))

    rows = fintabnet_jsonl_scan(spark, str(d / "*.jsonl")).collect()
    by_table = {r.table_id: r for r in rows}
    # per-file line numbering
    assert [by_table[t].line_idx for t in (1, 2, 7)] == [0, 1, 2]
    assert [by_table[t].line_idx for t in (3, 4, 5)] == [0, 1, 2]
    # document_table_index follows in-file order per document
    assert [by_table[t].document_table_index for t in (1, 2)] == [0, 1]
    assert [by_table[t].document_table_index for t in (3, 4, 5)] == [0, 1, 2]


def test_create_table_dict_rejects_empty_html(spark):
    """Unparseable/empty HTML must reject (the reference raises on
    max() of an empty list and drops the table) — never accept a
    zero-cell table as valid."""
    table = create_table_dict("<table></table>", [])
    assert "no cells parsed" in table["reject"]
    assert table["cells"] == []
