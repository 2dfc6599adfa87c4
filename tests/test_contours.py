"""Contour tracer parity: Python spec and native C++ vs OpenCV itself.

The reference calls cv::findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE)
(src/mask2polygon.cpp:29-36); cv2 *is* OpenCV, so differential testing gives
a real parity guarantee, point-for-point and order-for-order.
"""

import cv2
import numpy as np
import pytest

from unetseg_tpu.io import contours_py, jsonfmt, native


def cv2_contours(mask):
    _, binary = cv2.threshold(mask, 127, 255, cv2.THRESH_BINARY)
    cs, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return [[tuple(int(v) for v in p) for p in c.reshape(-1, 2)] for c in cs]


def _random_mask(rng, trial):
    h, w = int(rng.integers(4, 80)), int(rng.integers(4, 80))
    kind = trial % 3
    if kind == 0:
        return (rng.random((h, w)) > 0.55).astype(np.uint8) * 255
    if kind == 1:
        sm = cv2.blur(rng.random((h, w)).astype(np.float32), (7, 7))
        return (sm > 0.5).astype(np.uint8) * 255
    m = np.zeros((h, w), np.uint8)
    for _ in range(int(rng.integers(1, 6))):
        cv2.circle(
            m,
            (int(rng.integers(0, w)), int(rng.integers(0, h))),
            int(rng.integers(1, 12)),
            255,
            int(rng.choice([-1, 1])),
        )
    return m


@pytest.mark.parametrize("impl", ["python", "native"])
def test_differential_vs_cv2(impl):
    if impl == "native" and not native.available():
        pytest.skip("native lib unavailable")
    fn = (
        native.extract_contours
        if impl == "native"
        else contours_py.extract_contours
    )
    rng = np.random.default_rng(123)
    for trial in range(150):
        m = _random_mask(rng, trial)
        assert fn(m) == cv2_contours(m), f"trial {trial}"


@pytest.mark.parametrize("impl", ["python", "native"])
def test_edge_cases(impl):
    if impl == "native" and not native.available():
        pytest.skip("native lib unavailable")
    fn = (
        native.extract_contours
        if impl == "native"
        else contours_py.extract_contours
    )
    cases = []
    m = np.zeros((8, 8), np.uint8)
    cases.append(m.copy())  # empty
    m[3, 3] = 255
    cases.append(m.copy())  # single pixel
    m = np.zeros((8, 8), np.uint8)
    m[0:3, 0:3] = 255
    cases.append(m.copy())  # touches frame
    m = np.full((6, 6), 255, np.uint8)
    cases.append(m.copy())  # all fg
    m = np.zeros((20, 20), np.uint8)
    cv2.rectangle(m, (2, 2), (17, 17), 255, -1)
    cv2.rectangle(m, (5, 5), (14, 14), 0, -1)
    cv2.rectangle(m, (8, 8), (11, 11), 255, -1)
    cases.append(m.copy())  # nested-in-hole excluded
    m = np.zeros((10, 10), np.uint8)
    m[1:4, 1:4] = 255
    m[4:7, 4:7] = 255
    cases.append(m.copy())  # diagonal pinch (figure 8)
    m = np.zeros((8, 8), np.uint8)
    m[3, 2:6] = 255
    cases.append(m.copy())  # 1px horizontal line
    # threshold boundary: 127 is background, 128 is foreground
    m = np.zeros((4, 4), np.uint8)
    m[1, 1] = 127
    m[2, 2] = 128
    cases.append(m.copy())
    for i, m in enumerate(cases):
        assert fn(m) == cv2_contours(m), f"case {i}"


def test_map_contour_points_truncates():
    cs = [[(1, 1), (511, 511)]]
    got = contours_py.map_contour_points(cs, 1000 / 512, 999 / 512)
    # int() truncation, not rounding (src/mask2polygon.cpp:54-55):
    # 511*1000/512 = 998.05 -> 998 ; 511*999/512 = 997.07 -> 997
    assert got == [[(1, 1), (998, 997)]]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_json_matches_python_emitter():
    rng = np.random.default_rng(5)
    m = _random_mask(rng, 1)
    cs = native.extract_contours(m)
    sx, sy = 2048 / m.shape[1], 1536 / m.shape[0]
    nat = native.contour_json_bytes(cs, "img_x", 2048, 1536, sx, sy)
    py = jsonfmt.contour_json_bytes(
        contours_py.map_contour_points(cs, sx, sy), "img_x", 2048, 1536
    )
    assert nat == py
    assert native.size_json_bytes("a.raw", 10, 20) == jsonfmt.size_json_bytes(
        "a.raw", 10, 20
    )


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_preprocess_bit_exact():
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 65536, size=(300, 500), dtype=np.uint16)
    np.testing.assert_array_equal(
        native.preprocess_u8(raw), preprocess_oracle_u8(raw)
    )
    # saturated uniform input: the mn==mx bump must widen to int like the
    # oracle — wrapping uint16 at 65535 underflowed the same-size LUT and
    # aborted the process (round-4 review finding, reproduced);
    # cover both the same-size LUT path and the general bilinear path
    for shape, out_size in (((64, 64), 64), ((300, 500), 64)):
        sat = np.full(shape, 65535, np.uint16)
        np.testing.assert_array_equal(
            native.preprocess_u8(sat, out_size),
            preprocess_oracle_u8(sat, out_size))
        assert int(native.preprocess_u8(sat, out_size).max()) == 0


def test_contours_per_class():
    m = np.zeros((32, 32), np.uint8)
    cv2.circle(m, (8, 8), 5, 1, -1)
    cv2.circle(m, (22, 22), 6, 2, -1)
    per = native.contours_per_class(m)
    assert set(per) == {1, 2}
    for c in (1, 2):
        want = cv2_contours(np.where(m == c, 255, 0).astype(np.uint8))
        assert per[c] == want


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_fuzz_512_masks_native():
    """Full-size parity fuzz: production-resolution masks, blobby + speckle
    + ring topologies, native tracer vs cv2 exactly."""
    rng = np.random.default_rng(2024)
    for trial in range(12):
        kind = trial % 3
        if kind == 0:
            sm = cv2.blur(rng.random((512, 512)).astype(np.float32), (41, 41))
            m = (sm > 0.5).astype(np.uint8) * 255
        elif kind == 1:
            m = (rng.random((512, 512)) > 0.6).astype(np.uint8) * 255
        else:
            m = np.zeros((512, 512), np.uint8)
            for _ in range(20):
                cv2.circle(
                    m,
                    (int(rng.integers(0, 512)), int(rng.integers(0, 512))),
                    int(rng.integers(2, 80)), 255, int(rng.choice([-1, 1, 3])),
                )
        assert native.extract_contours(m) == cv2_contours(m), f"trial {trial}"
