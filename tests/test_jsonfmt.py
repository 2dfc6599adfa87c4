"""Byte-level parity of our JSON emitters with nlohmann::json.

Goldens in tests/golden/ were produced by nlohmann::json v3.12 with the exact
construction/serialization calls of the reference (``operator<<`` for the size
JSON, ``std::setw(4)`` for the contour JSON); see SURVEY.md §2 #13.
"""

import os

from unetseg_tpu.io import jsonfmt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _read(name):
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


def test_size_json_bytes():
    got = jsonfmt.size_json_bytes("img_001.raw", 2048, 1536)
    assert got == _read("size_golden.json")


def test_contour_json_bytes():
    contours = [[(12, 34), (56, 78), (90, 11)], [(1, 2)]]
    got = jsonfmt.contour_json_bytes(contours, "img_001", 2048, 1536)
    assert got == _read("contour_golden.json")


def test_contour_json_empty_shapes():
    got = jsonfmt.contour_json_bytes([], "img_001", 2048, 1536)
    assert got == _read("contour_empty_golden.json")
