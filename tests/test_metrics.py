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


def test_boundary_distances_identity_and_shift():
    from unetseg_tpu.metrics import boundary_distances

    m = np.zeros((64, 64), np.uint8)
    m[20:40, 20:40] = 2
    d = boundary_distances(m, m)
    assert d == {"hausdorff": 0.0, "hd95": 0.0, "assd": 0.0}

    # a pure k-pixel translation of a large square: every boundary point of
    # one square is within k of the other, and the far corners realize it
    shifted = np.zeros((64, 64), np.uint8)
    shifted[23:43, 20:40] = 2
    d = boundary_distances(m, shifted)
    assert d["hausdorff"] == 3.0
    assert 0.0 < d["assd"] <= 3.0
    assert d["hd95"] <= d["hausdorff"]


def test_boundary_distances_empty_semantics():
    from unetseg_tpu.metrics import boundary_distances

    empty = np.zeros((32, 32), np.uint8)
    organ = np.zeros((32, 32), np.uint8)
    organ[10:20, 10:20] = 2
    assert boundary_distances(empty, empty)["hausdorff"] == 0.0
    assert boundary_distances(empty, organ)["hd95"] == float("inf")
    assert boundary_distances(organ, empty)["assd"] == float("inf")


def test_boundary_distances_border_touching():
    from unetseg_tpu.metrics import boundary_distances

    # organ flush with the image border: the border edge still counts as
    # boundary (consistent with traced contours), so a one-pixel inset of
    # that edge is distance-1, not distance-0
    a = np.zeros((16, 16), np.uint8)
    a[0:8, 4:12] = 2
    b = np.zeros((16, 16), np.uint8)
    b[1:8, 4:12] = 2
    d = boundary_distances(a, b)
    assert d["hausdorff"] == 1.0


def test_spearman_tie_handling():
    from unetseg_tpu.metrics import spearman

    # perfect monotone relations
    assert abs(spearman([1, 2, 3], [10, 20, 30]) - 1.0) < 1e-12
    assert abs(spearman([1, 2, 3], [3, 2, 1]) + 1.0) < 1e-12
    # ties get average ranks: the result must not depend on input order
    a = [1, 1, 1, 2, 2, 3]
    b = [6, 5, 4, 3, 2, 1]
    r1 = spearman(a, b)
    r2 = spearman(list(reversed(a)), list(reversed(b)))
    assert abs(r1 - r2) < 1e-12
    # constant input: correlation undefined, not a spurious nonzero
    # (argsort-of-argsort returned input-order correlation here)
    assert np.isnan(spearman([7, 7, 7, 7], [1, 2, 3, 4]))
    # agrees with scipy's definition on a tied example (hand-checked):
    # ranks of a = [1,1,1,2,2,3] -> [1,1,1,3.5,3.5,5] (0-based: [1,1,1,3.5,3.5,5])
    # pearson of those ranks vs reversed distinct ranks = r1
    ra = np.array([1.0, 1.0, 1.0, 3.5, 3.5, 5.0])
    rb = np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.0])
    ra -= ra.mean(); rb -= rb.mean()
    want = float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))
    assert abs(r1 - want) < 1e-12
