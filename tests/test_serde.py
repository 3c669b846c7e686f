"""Fast-decoder parity: orjson and stdlib json must agree on payloads."""

import json
import zlib

from table_transformer_spark.fixtures.generate import (
    encode_page_payload,
    synth_page,
)
from table_transformer_spark.serde import decode_zlib_json, json_loads


def test_decode_matches_stdlib_on_fixture_payloads():
    for ref in ("m-000001-0", "m-000042-1", "m-777777-3"):
        page = synth_page(ref)
        payload = encode_page_payload(page)
        assert decode_zlib_json(payload) == page
        assert decode_zlib_json(payload) == json.loads(
            zlib.decompress(payload).decode())


def test_json_loads_handles_bytes_and_str():
    doc = {"a": [1, 2.5, "x", None, True], "b": {"c": -7}}
    raw = json.dumps(doc)
    assert json_loads(raw) == doc
    assert json_loads(raw.encode()) == doc
