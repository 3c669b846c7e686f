"""Containment assignment + greedy suppression micro-kernels.

These are the order-sensitive per-table primitives of the reference
pipeline (``src/postprocess.py:183-259,443-485``).  They run on tiny
inputs (≤125 structure objects per table — the DETR query budget,
``src/structure_config.json:23``) inside an ``applyInPandas`` group, so
the O(n²) greedy scans are deliberate: greedy *order* is semantics
(a hash-join reformulation would change results).

The scalable DataFrame twins of the assignment step live in
``table_transformer_spark.operators.slotting`` (argmax window over an
iob theta-join).
"""

from __future__ import annotations

import numpy as np

from ..geometry import Box, np_box_area, np_iob_matrix, np_pairwise_intersection
from .text import assemble_text

__all__ = [
    "order_by_score",
    "order_left_to_right",
    "order_top_to_bottom",
    "slot_into_containers",
    "greedy_nms",
    "nms_by_containment",
    "drop_containers_without_text",
    "filter_by_score",
]


def filter_by_score(objects, threshold):
    """Keep objects with score ≥ threshold (``src/postprocess.py:9-13``)."""
    return [o for o in objects if o["score"] >= threshold]


def order_by_score(objects, descending: bool = True):
    """Stable score ordering (``src/postprocess.py:251-259``).

    Stability matters: equal scores keep input order, which feeds the
    greedy tie-breaks downstream.
    """
    sign = -1.0 if descending else 1.0
    return sorted(objects, key=lambda o: sign * o["score"])


def order_left_to_right(objects):
    """Sort by x-center ×2 (``src/postprocess.py:358-362``)."""
    return sorted(objects, key=lambda o: o["bbox"][0] + o["bbox"][2])


def order_top_to_bottom(objects):
    """Sort by y-center ×2 (``src/postprocess.py:365-369``)."""
    return sorted(objects, key=lambda o: o["bbox"][1] + o["bbox"][3])


def slot_into_containers(containers, packages, overlap_threshold: float = 0.5,
                         unique_assignment: bool = True,
                         forced_assignment: bool = False):
    """Assign each package to the container(s) holding the largest
    fraction of its area (``src/postprocess.py:208-248``).

    Returns ``(per_container_package_indices, per_package_container_indices,
    best_fraction_per_package)``.  Tie-break: ties in overlap fraction go
    to the lower container index (the reference sorts candidates with a
    stable descending sort, ``src/postprocess.py:232-238``).
    """
    by_container = [[] for _ in containers]
    by_package = [[] for _ in packages]
    best_scores = []

    if not containers or not packages:
        return by_container, by_package, best_scores

    pkg_boxes = np.asarray([p["bbox"] for p in packages], dtype=float)
    con_boxes = np.asarray([c["bbox"] for c in containers], dtype=float)
    inter = np_pairwise_intersection(pkg_boxes, con_boxes)  # (P, C)
    pkg_areas = np_box_area(pkg_boxes)
    # reference divides unconditionally (tokens always have positive
    # area there); guard degenerate packages to fraction 0 instead of
    # crashing.
    fractions = np.divide(
        inter,
        pkg_areas[:, None],
        out=np.zeros_like(inter),
        where=pkg_areas[:, None] > 0.0,
    )

    if unique_assignment:
        # fully vectorized: np.argmax returns the FIRST maximum — the
        # exact stable tie-break of the reference's sorted(key=-score)
        bests = np.argmax(fractions, axis=1)
        scores = fractions[np.arange(fractions.shape[0]), bests]
        best_scores = scores.tolist()
        take = (scores >= overlap_threshold) if not forced_assignment \
            else np.ones_like(scores, dtype=bool)
        for p in np.nonzero(take)[0]:
            c = int(bests[p])
            by_container[c].append(int(p))
            by_package[p].append(c)
        return by_container, by_package, best_scores

    for p in range(fractions.shape[0]):
        row = fractions[p]
        # stable descending argsort == the reference's stable
        # sorted(key=-score): ties keep container order
        order = np.argsort(-row, kind="stable")
        best = int(order[0])
        best_scores.append(float(row[best]))
        if forced_assignment or row[best] >= overlap_threshold:
            by_container[best].append(p)
            by_package[p].append(best)
        for c in order[1:]:
            if row[c] >= overlap_threshold:
                by_container[int(c)].append(p)
                by_package[p].append(int(c))
            else:
                break

    return by_container, by_package, best_scores


def greedy_nms(objects, match_criteria: str = "object2_overlap",
               match_threshold: float = 0.05, keep_higher: bool = True):
    """Greedy pairwise non-maxima suppression
    (``src/postprocess.py:443-485``).

    A later (lower-score) object is suppressed as soon as its overlap
    metric against any earlier surviving object reaches the threshold.
    Division-by-zero pairs are skipped, matching the reference's
    swallow-and-continue ``except`` (``src/postprocess.py:481-483``).
    """
    if not objects:
        return []

    objs = order_by_score(objects, descending=keep_higher)
    boxes = np.asarray([o["bbox"] for o in objs], dtype=float)
    areas = np_box_area(boxes)
    inter = np_pairwise_intersection(boxes, boxes)

    n = len(objs)
    suppressed = [False] * n
    for j in range(1, n):
        for i in range(j):
            if suppressed[i]:
                continue
            if match_criteria == "object1_overlap":
                denom = areas[i]
            elif match_criteria == "object2_overlap":
                denom = areas[j]
            elif match_criteria == "iou":
                denom = areas[i] + areas[j] - inter[i, j]
            else:
                raise ValueError(f"unknown match criteria: {match_criteria}")
            if denom <= 0.0:
                continue  # reference recovers from divide-by-zero
            if inter[i, j] / denom >= match_threshold:
                suppressed[j] = True
                break

    return [o for o, s in zip(objs, suppressed) if not s]


def nms_by_containment(containers, packages, overlap_threshold: float = 0.5):
    """Suppress a container when a higher-score container already owns
    any of its packages, or when it owns none
    (``src/postprocess.py:183-205``).

    Quirk preserved: the top-score container is never suppressed, even
    when it contains no packages (the scan starts at index 1).
    """
    ordered = order_by_score(containers)
    owned, _, _ = slot_into_containers(
        ordered, packages, overlap_threshold=overlap_threshold,
        unique_assignment=True, forced_assignment=False)

    n = len(ordered)
    suppressed = [False] * n
    for j in range(1, n):
        mine = set(owned[j])
        if not mine:
            suppressed[j] = True
        for i in range(j):
            if not suppressed[i] and mine & set(owned[i]):
                suppressed[j] = True
    return [o for o, s in zip(ordered, suppressed) if not s]


def drop_containers_without_text(spans, objects):
    """Remove objects whose contained text is empty, in place
    (``src/postprocess.py:262-270``).

    The span→object containment test is batched into one iob matrix
    (identical arithmetic to the scalar ``overlaps`` predicate)."""
    if not objects:
        return
    if not spans:
        # no spans ⇒ every object's text is empty ⇒ all removed
        objects.clear()
        return

    span_boxes = np.asarray([s["bbox"] for s in spans], dtype=float)
    obj_boxes = np.asarray([o["bbox"] for o in objects], dtype=float)
    contained = np_iob_matrix(span_boxes, obj_boxes) >= 0.5
    for j, obj in enumerate(list(objects)):
        subset = [spans[i] for i in np.nonzero(contained[:, j])[0]]
        if not assemble_text(subset, remove_integer_superscripts=True).strip():
            objects.remove(obj)
