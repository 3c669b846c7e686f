"""Closed label enums and per-class score thresholds.

Mirrors the reference's constant maps (``src/inference.py:51-80``).
These are tiny dimension tables: on the DataFrame side they are
broadcast-joined; inside kernels they are plain dict lookups.
"""

from __future__ import annotations

# structure-recognition label set (src/inference.py:51-61)
STRUCTURE_LABELS = [
    "table",
    "table column",
    "table row",
    "table column header",
    "table projected row header",
    "table spanning cell",
    "no object",
]

# detection label set (src/inference.py:63)
DETECTION_LABELS = ["table", "table rotated", "no object"]

# per-class score thresholds (src/inference.py:66-80); 'no object' = 10
# acts as an always-drop sentinel.
DETECTION_CLASS_THRESHOLDS = {
    "table": 0.5,
    "table rotated": 0.5,
    "no object": 10,
}

STRUCTURE_CLASS_THRESHOLDS = {
    "table": 0.5,
    "table column": 0.5,
    "table row": 0.5,
    "table column header": 0.5,
    "table projected row header": 0.5,
    "table spanning cell": 0.5,
    "no object": 10,
}

# amount of padding around a detected table when cropping
# (src/inference.py:116-117)
DEFAULT_CROP_PADDING = 10
