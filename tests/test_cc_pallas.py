"""Pallas segmented-scan CCL vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.ops import cc, postprocess
from unetseg_tpu.ops.cc_pallas import cc_label_pallas


def _check(fg):
    want = np.asarray(cc.cc_label(jnp.asarray(fg)))
    got = np.asarray(cc_label_pallas(jnp.asarray(fg), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_blobs(seed):
    rng = np.random.default_rng(seed)
    _check(rng.random((64, 64)) > 0.55)


def test_spiral_worst_case():
    H = W = 64
    fg = np.zeros((H, W), bool)
    x0, y0, x1, y1 = 0, 0, W - 1, H - 1
    while x0 < x1:
        fg[y0, x0:x1 + 1] = True
        fg[y0:y1 + 1, x1] = True
        fg[y1, x0:x1 + 1] = True
        fg[y0 + 2:y1 + 1, x0] = True
        x0 += 4
        y0 += 4
        x1 -= 4
        y1 -= 4
    _check(fg)


def test_serpentine_exceeds_fixed_pass_caps():
    """A 1-px boustrophedon serpentine needs ~one pass per turn; at 128²
    that is ~64 turns — proving the H+W default pass bound (not a fixed
    cap) converges on the pathological family ADVICE r2 flagged."""
    H = W = 128
    fg = np.zeros((H, W), bool)
    for r in range(0, H, 2):
        fg[r, :] = True
        if r + 1 < H:  # alternate the connecting column
            col = W - 1 if (r // 2) % 2 == 0 else 0
            fg[r + 1, col] = True
    _check(fg)
    # the whole serpentine is ONE component
    lbl = np.asarray(cc_label_pallas(jnp.asarray(fg), interpret=True))
    assert len(np.unique(lbl[fg])) == 1


def test_degenerate_masks():
    _check(np.zeros((32, 32), bool))
    _check(np.ones((32, 32), bool))
    single = np.zeros((32, 32), bool)
    single[5, 7] = True
    _check(single)


def test_diagonal_only_links():
    fg = np.zeros((16, 16), bool)
    fg[2, 2] = fg[3, 3] = fg[4, 4] = True     # one 8-connected chain
    fg[10, 2] = fg[12, 4] = True              # two separate pixels
    _check(fg)


def test_batched():
    rng = np.random.default_rng(9)
    fg = rng.random((3, 32, 32)) > 0.5
    want = np.stack([np.asarray(cc.cc_label(jnp.asarray(f))) for f in fg])
    got = np.asarray(cc_label_pallas(jnp.asarray(fg), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_postprocess_v3_matches_oracle_synth():
    from unetseg_tpu import data

    rng = np.random.default_rng(5)
    _, lab = data.synth_slice(rng, 128)
    m = jnp.asarray(lab)
    v1 = np.asarray(postprocess.postprocess_mask(m))
    v2 = np.asarray(postprocess.postprocess_mask(m, use_pallas_cc=True,
                                                 interpret=True))
    np.testing.assert_array_equal(v1, v2)


def test_postprocess_v3_matches_oracle_adversarial():
    """Every branch of the scatter-lean fast path: big interior hole (too
    large to fill), small interior hole (filled), border-touching inverse
    region (never filled), sub-threshold fg blob (dropped), class-1 pixels
    in the hole (inv includes them), single-pixel noise."""
    h = w = 64
    m = np.zeros((h, w), np.uint8)
    # large fg blob with two holes
    m[4:60, 4:40] = 2
    m[10:16, 10:16] = 0            # small hole -> filled
    m[24:36, 8:30] = 0             # hole area 264 >= 6%*4096=245 -> NOT filled
    m[12, 12] = 1                  # class-1 inside the small hole (still inv)
    # fg blob touching nothing, below area threshold -> dropped by filter
    m[50:54, 50:54] = 2
    # inverse region connected to the border (the background) must never fill
    m[0:2, 0:2] = 0
    # single-pixel fg noise
    m[62, 62] = 2

    v1 = np.asarray(postprocess.postprocess_mask(jnp.asarray(m)))
    v2 = np.asarray(postprocess.postprocess_mask(
        jnp.asarray(m), use_pallas_cc=True, interpret=True))
    np.testing.assert_array_equal(v1, v2)
    # sanity vs intent: the big hole survived, the small one filled
    assert v1[12, 12] == 2 and v1[30, 20] == 0


def test_postprocess_v3_batch():
    from unetseg_tpu import data

    rng = np.random.default_rng(11)
    masks = np.stack([data.synth_slice(rng, 64)[1] for _ in range(3)])
    v1 = np.asarray(postprocess.postprocess_batch(jnp.asarray(masks)))
    v2 = np.asarray(postprocess.postprocess_batch(
        jnp.asarray(masks), use_pallas_cc=True, interpret=True))
    np.testing.assert_array_equal(v1, v2)


def test_propagate_min_pallas_regions():
    from unetseg_tpu.ops.cc_pallas import propagate_min_pallas

    fg = np.zeros((16, 16), bool)
    fg[2:5, 2:10] = True
    fg[10:14, 1:6] = True
    seeds = np.full((16, 16), 999, np.int32)   # sentinel
    seeds[fg] = 500
    seeds[3, 7] = 42                            # min of region 1
    seeds[13, 5] = 7                            # min of region 2
    out = np.asarray(propagate_min_pallas(
        jnp.asarray(seeds), sentinel=999, interpret=True))
    assert (out[2:5, 2:10] == 42).all()
    assert (out[10:14, 1:6] == 7).all()
    assert (out[~fg] == 999).all()


def test_postprocess_v3_odd_shapes():
    """Non-square, non-aligned shapes (reached in production via the
    sliding-window crop path, engine.infer_tiled): fast path == oracle."""
    rng = np.random.default_rng(21)
    for shape in ((70, 63), (33, 90), (17, 15), (64, 1)):
        m = (rng.random(shape) > 0.4).astype(np.uint8) * 2
        v1 = np.asarray(postprocess.postprocess_mask(jnp.asarray(m)))
        v2 = np.asarray(postprocess.postprocess_mask(
            jnp.asarray(m), use_pallas_cc=True, interpret=True))
        np.testing.assert_array_equal(v1, v2, err_msg=str(shape))


# ---------------------------------------------------------------------------
# Device postprocess v4: slot-compressed component stats (round 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", ["organ", "empty", "full", "speckle",
                                  "ring", "many-blobs"])
def test_postprocess_v4_matches_oracle(case):
    """v4 (K-slot compare-reduce stats + exact cond fallback) must equal the
    XLA oracle bit-for-bit, including on masks with more components than
    slots (the speckle case exercises the fallback branch)."""
    rng = np.random.default_rng(hash(case) % 2**31)
    S = 96
    if case == "organ":
        from unetseg_tpu import data

        _, m = data.synth_slice(rng, S)
    elif case == "empty":
        m = np.zeros((S, S), np.uint8)
    elif case == "full":
        m = np.full((S, S), 2, np.uint8)
    elif case == "speckle":
        m = (rng.random((S, S)) > 0.5).astype(np.uint8) * 2
    elif case == "ring":
        m = np.zeros((S, S), np.uint8)
        m[10:80, 10:80] = 2
        m[30:60, 30:60] = 0
    else:  # many-blobs: > K_SLOTS tiny fg components
        m = np.zeros((S, S), np.uint8)
        m[::4, ::4] = 2
    want = np.asarray(postprocess.postprocess_mask_jit(jnp.asarray(m)))
    got = np.asarray(postprocess.postprocess_batch_v4(
        jnp.asarray(m[None]), interpret=True))[0]
    np.testing.assert_array_equal(got, want)


def test_postprocess_v4_batched():
    from unetseg_tpu import data

    rng = np.random.default_rng(9)
    masks = np.stack([data.synth_slice(rng, 64)[1] for _ in range(4)])
    want = np.asarray(jax.vmap(postprocess.postprocess_mask)(
        jnp.asarray(masks)))
    got = np.asarray(postprocess.postprocess_batch_v4(
        jnp.asarray(masks), interpret=True))
    np.testing.assert_array_equal(got, want)
