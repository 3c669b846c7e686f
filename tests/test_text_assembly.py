"""Tests for reading-order text assembly (reference
``extract_text_from_spans``, src/postprocess.py:307-355)."""

from table_transformer_spark.kernels.text import assemble_text, text_inside_bbox


def tok(text, block=0, line=0, span=0, flags=0, bbox=None):
    return {"text": text, "block_num": block, "line_num": line,
            "span_num": span, "flags": flags,
            "bbox": bbox or [0, 0, 1, 1]}


def test_empty():
    assert assemble_text([]) == ""


def test_single_line_order():
    spans = [tok("world", span=1), tok("hello", span=0)]
    assert assemble_text(spans) == "hello world"


def test_block_line_span_sort_cascade():
    spans = [
        tok("c", block=1, line=0, span=0),
        tok("b", block=0, line=1, span=0),
        tok("a", block=0, line=0, span=1),
        tok("z", block=0, line=0, span=0),
    ]
    assert assemble_text(spans) == "z a b c"


def test_hyphen_line_join():
    # a line ending in non-space+hyphen joins without extra space in the
    # no-space mode; in space mode words are space-joined anyway
    spans = [tok("multi-", line=0), tok("word", line=1)]
    assert assemble_text(spans) == "multi- word"
    assert assemble_text(spans, join_with_space=False) == "multi-word"


def test_line_break_adds_space_in_nospace_mode():
    spans = [tok("foo", line=0), tok("bar", line=1)]
    assert assemble_text(spans, join_with_space=False) == "foo bar"


def test_superscript_integer_removed():
    spans = [tok("value", span=0), tok("2", span=1, flags=1)]
    assert assemble_text(spans, remove_integer_superscripts=True) == "value"
    assert assemble_text(spans, remove_integer_superscripts=False) == "value 2"


def test_superscript_non_integer_kept():
    spans = [tok("value", span=0), tok("nd", span=1, flags=1)]
    assert assemble_text(spans, remove_integer_superscripts=True) == "value nd"


def test_text_inside_bbox_filters_by_overlap():
    spans = [
        tok("in", bbox=[0, 0, 10, 10]),
        tok("out", span=1, bbox=[100, 100, 110, 110]),
        tok("half", span=2, bbox=[5, 0, 15, 10]),  # exactly 50% inside
    ]
    assert text_inside_bbox(spans, [0, 0, 10, 10]) == "in half"
