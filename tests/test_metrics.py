import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu import metrics


def test_iou_dice_perfect_and_disjoint():
    a = np.array([[0, 1], [2, 2]], np.uint8)
    iou = np.asarray(metrics.iou_per_class(a, a, 3))
    np.testing.assert_allclose(iou, 1.0)

    b = np.array([[2, 2], [0, 1]], np.uint8)
    fg = float(metrics.foreground_iou(a, b))
    assert fg == 0.0


def test_iou_half_overlap():
    p = np.zeros((4, 4), np.uint8)
    t = np.zeros((4, 4), np.uint8)
    p[:2] = 2
    t[1:3] = 2
    # inter 4, union 12
    np.testing.assert_allclose(float(metrics.foreground_iou(p, t)), 4 / 12)
    d = np.asarray(metrics.dice_per_class(p, t, 3))
    np.testing.assert_allclose(d[2], 2 * 4 / 16)


def test_absent_class_scores_one():
    p = np.zeros((4, 4), np.uint8)
    t = np.zeros((4, 4), np.uint8)
    iou = np.asarray(metrics.iou_per_class(p, t, 3))
    np.testing.assert_allclose(iou, [1.0, 1.0, 1.0])


def test_polygon_iou_identity_and_shift():
    sq = [[(2, 2), (2, 10), (10, 10), (10, 2)]]
    assert metrics.polygon_iou(sq, sq, 16, 16) == 1.0
    shifted = [[(3, 2), (3, 10), (11, 10), (11, 2)]]
    v = metrics.polygon_iou(sq, shifted, 16, 16)
    assert 0.5 < v < 1.0


def test_evaluate_masks_report():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 3, (2, 32, 32)).astype(np.uint8)
    rep = metrics.evaluate_masks(t, t)
    assert rep["mean_iou"] == 1.0 and rep["foreground_iou"] == 1.0
    assert set(rep) >= {"iou_class0", "dice_class2"}


def test_confusion_counts_matches_numpy_bincount():
    """Per-slice int32 scatter + float batch reduce (round-4 review: a flat
    int32 scatter wrapped negative past ~2.1e9 pixels) must still produce
    exact counts on multi-slice batches."""
    rng = np.random.default_rng(11)
    pred = rng.integers(0, 3, (5, 37, 41)).astype(np.uint8)
    targ = rng.integers(0, 3, (5, 37, 41)).astype(np.uint8)
    got = np.asarray(metrics.confusion_counts(
        jnp.asarray(pred), jnp.asarray(targ), 3))
    want = np.bincount((targ.reshape(-1).astype(np.int64) * 3
                        + pred.reshape(-1)), minlength=9).reshape(3, 3)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_evaluate_masks_single_pass_consistency():
    rng = np.random.default_rng(12)
    pred = rng.integers(0, 3, (3, 32, 32)).astype(np.uint8)
    targ = rng.integers(0, 3, (3, 32, 32)).astype(np.uint8)
    rep = metrics.evaluate_masks(pred, targ)
    fg = float(metrics.foreground_iou(jnp.asarray(pred), jnp.asarray(targ)))
    assert rep["foreground_iou"] == pytest.approx(fg, abs=1e-6)
    iou = np.asarray(metrics.iou_per_class(jnp.asarray(pred),
                                           jnp.asarray(targ), 3))
    for c in range(3):
        assert rep[f"iou_class{c}"] == pytest.approx(float(iou[c]), abs=1e-6)
