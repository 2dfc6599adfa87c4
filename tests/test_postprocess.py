"""Device postprocess vs an OpenCV oracle transcribing postprocess.cpp."""

import cv2
import numpy as np
import pytest

from unetseg_tpu.ops import cc as cc_ops
from unetseg_tpu.ops import decode, morphology, postprocess


# ---------------------------------------------------------------------------
# Oracle: literal transcription of /root/reference/src/postprocess.cpp using
# the same OpenCV calls the reference makes.
# ---------------------------------------------------------------------------

def _min_area(w, h):
    return int(np.float32(w * h) * np.float32(0.06))


def oracle_fill_holes(mask):
    m = mask.copy()
    bin_ = np.where(m == 2, 255, 0).astype(np.uint8)
    inv = cv2.bitwise_not(bin_)
    nc, labels, stats, _ = cv2.connectedComponentsWithStats(inv, connectivity=8)
    h, w = m.shape
    min_area = _min_area(w, h)
    for i in range(1, nc):
        left, top, width, height, area = stats[i]
        right, bottom = left + width - 1, top + height - 1
        if left > 0 and top > 0 and right < w - 1 and bottom < h - 1 and area < min_area:
            m[labels == i] = 2
    return m


def oracle_postprocess(mask):
    m = oracle_fill_holes(mask)
    bin_ = np.where(m == 2, 255, 0).astype(np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    bin_ = cv2.morphologyEx(bin_, cv2.MORPH_OPEN, kernel)
    nc, labels, stats, _ = cv2.connectedComponentsWithStats(bin_, connectivity=8)
    h, w = m.shape
    min_area = _min_area(w, h)
    keep = np.zeros_like(bin_)
    for i in range(1, nc):
        if stats[i, cv2.CC_STAT_AREA] >= min_area:
            keep[labels == i] = 255
    out = np.zeros_like(m)
    out[keep == 255] = 2
    return out


def random_mask(seed, h=128, w=128, classes=3):
    """Blobby multi-class mask via thresholded smoothed noise."""
    rng = np.random.default_rng(seed)
    noise = rng.random((h, w)).astype(np.float32)
    smooth = cv2.blur(noise, (15, 15))
    mask = np.zeros((h, w), np.uint8)
    mask[smooth > 0.5] = 2
    mask[(smooth > 0.47) & (smooth <= 0.5)] = 1
    return mask


# ---------------------------------------------------------------------------
# CC labeling vs cv2
# ---------------------------------------------------------------------------

def _cc_equivalent(fg, lbl):
    """Our labels and cv2's must induce the same partition of fg pixels."""
    nc, ref = cv2.connectedComponentsWithStats(
        (fg * 255).astype(np.uint8), connectivity=8
    )[:2]
    lbl = np.asarray(lbl)
    fgb = fg.astype(bool)
    # map our root -> cv2 label must be a bijection on fg pixels
    ours = lbl[fgb]
    theirs = ref[fgb]
    pair_of_ours = {}
    pair_of_theirs = {}
    for a, b in zip(ours.tolist(), theirs.tolist()):
        assert pair_of_ours.setdefault(a, b) == b
        assert pair_of_theirs.setdefault(b, a) == a
    # background pixels must carry the sentinel
    assert (lbl[~fgb] == fg.size).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_label_random(seed):
    mask = random_mask(seed) == 2
    lbl = np.asarray(cc_ops.cc_label(mask))
    _cc_equivalent(mask, lbl)


def test_cc_label_spiral():
    """Worst-case chain topology for naive propagation."""
    h = w = 65
    fg = np.zeros((h, w), bool)
    x0, x1, y0, y1 = 0, w - 1, 0, h - 1
    while x0 <= x1 and y0 <= y1:
        fg[y0, x0 : x1 + 1] = True
        fg[y0 : y1 + 1, x1] = True
        x0 += 2
        y0 += 2
        x1 -= 2
        y1 -= 2
    lbl = np.asarray(cc_ops.cc_label(fg))
    _cc_equivalent(fg, lbl)


def test_cc_label_diagonal_and_isolated():
    fg = np.zeros((16, 16), bool)
    for i in range(8):
        fg[i, i] = True  # 8-connected diagonal = one component
    fg[12, 12] = True
    fg[0, 15] = True
    lbl = np.asarray(cc_ops.cc_label(fg))
    _cc_equivalent(fg, lbl)


def test_cc_stats_vs_cv2():
    mask = random_mask(5) == 2
    lbl, stats = cc_ops.connected_components_with_stats(mask)
    lbl = np.asarray(lbl)
    nc, ref_lbl, ref_stats, _ = cv2.connectedComponentsWithStats(
        (mask * 255).astype(np.uint8), connectivity=8
    )
    for i in range(1, nc):
        ours = np.unique(lbl[ref_lbl == i])
        assert ours.size == 1
        r = int(ours[0])
        left, top, width, height, area = ref_stats[i]
        assert int(stats.area[r]) == area
        assert int(stats.min_col[r]) == left
        assert int(stats.min_row[r]) == top
        assert int(stats.max_col[r]) == left + width - 1
        assert int(stats.max_row[r]) == top + height - 1


# ---------------------------------------------------------------------------
# Morphology vs cv2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 3])
def test_open_vs_cv2(seed):
    fg = random_mask(seed) == 2
    bin_ = (fg * 255).astype(np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    want = cv2.morphologyEx(bin_, cv2.MORPH_OPEN, kernel) > 0
    got = np.asarray(morphology.open_(fg))
    np.testing.assert_array_equal(got, want)


def test_erode_border_semantics():
    """A foreground block flush against the border must not erode at the edge
    (OpenCV pads erosion with +inf)."""
    fg = np.zeros((8, 8), bool)
    fg[0:3, 0:3] = True
    got = np.asarray(morphology.erode(fg))
    bin_ = (fg * 255).astype(np.uint8)
    want = cv2.erode(bin_, cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))) > 0
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Full postprocess vs oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", list(range(6)))
def test_postprocess_random(seed):
    mask = random_mask(seed)
    want = oracle_postprocess(mask)
    got = np.asarray(postprocess.postprocess_mask_jit(mask))
    np.testing.assert_array_equal(got, want)


def test_postprocess_donut_with_hole():
    """Small interior hole gets filled; large one survives as background."""
    h = w = 128
    mask = np.zeros((h, w), np.uint8)
    cv2.circle(mask, (64, 64), 50, 2, -1)
    cv2.circle(mask, (64, 64), 10, 0, -1)  # small hole, area < 6% -> filled
    want = oracle_postprocess(mask)
    got = np.asarray(postprocess.postprocess_mask_jit(mask))
    np.testing.assert_array_equal(got, want)
    assert want[64, 64] == 2  # the hole really was filled


def test_postprocess_small_blob_removed():
    h = w = 128
    mask = np.zeros((h, w), np.uint8)
    cv2.circle(mask, (30, 30), 10, 2, -1)  # area ~314 < 983 = 6% threshold
    want = oracle_postprocess(mask)
    got = np.asarray(postprocess.postprocess_mask_jit(mask))
    np.testing.assert_array_equal(got, want)
    assert got.max() == 0


def test_postprocess_border_hole_not_filled():
    """Background region touching the border is not a hole."""
    h = w = 64
    mask = np.full((h, w), 2, np.uint8)
    mask[:, 30:34] = 0  # slit touching top/bottom borders
    want = oracle_postprocess(mask)
    got = np.asarray(postprocess.postprocess_mask_jit(mask))
    np.testing.assert_array_equal(got, want)


def test_postprocess_batch():
    masks = np.stack([random_mask(s) for s in range(3)])
    got = np.asarray(postprocess.postprocess_batch(masks))
    for i in range(3):
        np.testing.assert_array_equal(got[i], oracle_postprocess(masks[i]))


# ---------------------------------------------------------------------------
# Argmax decode
# ---------------------------------------------------------------------------

def test_decode_tie_break_lowest_index():
    logits = np.zeros((1, 2, 2, 3), np.float32)  # all ties -> class 0
    got = np.asarray(decode.decode_mask(logits))
    np.testing.assert_array_equal(got, 0)

    logits[0, 0, 0] = [1.0, 1.0, 0.5]  # tie between 0 and 1 -> 0
    logits[0, 0, 1] = [0.0, 2.0, 2.0]  # tie between 1 and 2 -> 1
    logits[0, 1, 0] = [-1.0, -0.5, -0.5]  # tie at max -> 1
    got = np.asarray(decode.decode_mask(logits))
    assert got[0, 0, 0] == 0 and got[0, 0, 1] == 1 and got[0, 1, 0] == 1


def test_decode_ignores_extra_channels():
    logits = np.zeros((1, 1, 1, 5), np.float32)
    logits[0, 0, 0] = [0, 1, 2, 99, 99]  # channels >=3 ignored
    assert int(decode.decode_mask(logits)[0, 0, 0]) == 2


def test_mask_to_image_lut():
    mask = np.array([[0, 1], [2, 0]], np.uint8)
    got = np.asarray(decode.mask_to_image(mask))
    np.testing.assert_array_equal(got, [[0, 128], [255, 0]])


# ---------------------------------------------------------------------------
# Native (C++) postprocess vs oracle and vs device twin
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", list(range(4)))
def test_native_postprocess_matches_oracle(seed):
    from unetseg_tpu.io import native

    if not native.available():
        pytest.skip("native lib unavailable")
    mask = random_mask(seed)
    want = oracle_postprocess(mask)
    got = native.postprocess_batch(mask)
    np.testing.assert_array_equal(got, want)


def test_native_postprocess_batched_matches_device():
    from unetseg_tpu.io import native

    if not native.available():
        pytest.skip("native lib unavailable")
    masks = np.stack([random_mask(s) for s in range(3)])
    got = native.postprocess_batch(masks)
    want = np.asarray(postprocess.postprocess_batch(masks))
    np.testing.assert_array_equal(got, want)


def test_native_postprocess_speckle_noise():
    """Worst case for CC: pure speckle, thousands of tiny components."""
    from unetseg_tpu.io import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    mask = (rng.random((128, 128)) > 0.5).astype(np.uint8) * 2
    np.testing.assert_array_equal(
        native.postprocess_batch(mask), oracle_postprocess(mask)
    )


def test_fuzz_512_postprocess_native():
    """Production-resolution postprocess parity fuzz (native vs cv2 oracle)."""
    from unetseg_tpu.io import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(77)
    for trial in range(4):
        sm = cv2.blur(rng.random((512, 512)).astype(np.float32), (31, 31))
        mask = np.zeros((512, 512), np.uint8)
        mask[sm > 0.52] = 2
        mask[(sm > 0.50) & (sm <= 0.52)] = 1
        np.testing.assert_array_equal(
            native.postprocess_batch(mask), oracle_postprocess(mask),
            err_msg=f"trial {trial}",
        )


def test_morphology_even_size_rejected():
    import jax.numpy as jnp

    m = jnp.zeros((8, 8), jnp.bool_)
    with pytest.raises(ValueError, match="odd"):
        morphology.erode(m, size=2)
    with pytest.raises(ValueError, match="odd"):
        morphology.dilate(m, size=4)


def test_logger_reinit_switches_jsonl(tmp_path):
    """Re-init must move the structured log to the NEW directory (it used
    to keep appending to the old run's timings.jsonl; round-4 review)."""
    from unetseg_tpu.utils.logger import SegmentationLog

    log = SegmentationLog()
    assert log.open(str(tmp_path / "run1"))
    log.record(event="a")
    assert log.open(str(tmp_path / "run2"))
    log.record(event="b")
    log.close()
    t1 = (tmp_path / "run1" / "timings.jsonl").read_text()
    t2 = (tmp_path / "run2" / "timings.jsonl").read_text()
    assert "a" in t1 and "b" not in t1
    assert "b" in t2
