"""Payload JSON serde with an optional fast decoder.

The fixture media payloads are zlib-compressed JSON (the opaque-blob
stand-in for PDF page bytes, ``fixtures/generate.py``).  Decoding them
is the single hottest line of the fused extraction kernel — stdlib
``json.loads`` measured 3.1s of a 6.9s single-core pass over 827 pages.
``orjson`` (public, Rust-backed, Arrow-ecosystem standard) decodes the
same bytes ~6× faster; it is used when importable and stdlib ``json``
otherwise, with identical results (both are strict RFC 8259 parsers).

Encoding stays stdlib ``json.dumps(sort_keys=True)`` on the generator
side so payload bytes are identical whether or not orjson is present —
only the decode path, which cannot change semantics, is switched.
"""

from __future__ import annotations

import json
import zlib

try:
    import orjson

    def json_loads(data):  # bytes | str -> obj
        return orjson.loads(data)
except ImportError:  # pragma: no cover - orjson is in the container
    def json_loads(data):
        if isinstance(data, (bytes, bytearray)):
            data = data.decode()
        return json.loads(data)


def decode_zlib_json(payload: bytes) -> dict:
    """zlib-compressed JSON payload -> dict (fast path when orjson exists)."""
    return json_loads(zlib.decompress(bytes(payload)))
