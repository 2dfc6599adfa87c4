"""Mesh/sharding paths on the 8-device virtual CPU topology (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu import train
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.parallel import batch as pbatch
from unetseg_tpu.parallel import mesh as pmesh
from unetseg_tpu.parallel import tiles, tta
from unetseg_tpu.ops import decode, postprocess

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64, compute_dtype="float32")


@pytest.fixture(scope="module")
def params():
    return unet.init(jax.random.key(0), SMALL)


def test_virtual_topology():
    assert len(jax.devices()) == 8


def test_sharded_batch_matches_single(params):
    mesh = pmesh.make_mesh(8)
    fn = pbatch.make_sharded_pipeline(SMALL, mesh)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(8, 64, 64), dtype=np.uint8)
    sharded = np.asarray(fn(params, jnp.asarray(u8)))

    # unsharded oracle
    x = u8.astype(np.float32) / 255.0
    logits = unet.apply(params, jnp.asarray(x)[..., None], SMALL)
    mask = decode.decode_mask(logits, 3)
    want = np.asarray(jax.vmap(postprocess.postprocess_mask)(mask))
    np.testing.assert_array_equal(sharded, want)


def test_spatial_sharding_matches(params):
    """Rows sharded over sp: XLA conv halo exchange must preserve results."""
    mesh = pmesh.make_mesh(8, sp=4)
    fn = pbatch.make_sharded_pipeline(SMALL, mesh, spatial=True)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(2, 64, 64), dtype=np.uint8)
    got = np.asarray(fn(params, jnp.asarray(u8)))

    x = u8.astype(np.float32) / 255.0
    logits = unet.apply(params, jnp.asarray(x)[..., None], SMALL)
    want = np.asarray(
        jax.vmap(postprocess.postprocess_mask)(decode.decode_mask(logits, 3))
    )
    np.testing.assert_array_equal(got, want)


def test_sliding_window_covers_and_blends(params):
    """Tiled inference on a 128² image with 64² windows ≈ direct inference.

    With overlapping Hann blending the logits are convex combinations of
    per-window logits; on a constant-ish random field the decoded masks agree
    except possibly at window boundaries.  We check full agreement of the
    blend machinery itself: window=image size -> exactly direct inference.
    """
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    fn = tiles.make_tiled_pipeline(SMALL, window=64, overlap=0)
    got = np.asarray(fn(params, jnp.asarray(u8)))

    x = (u8.astype(np.float32) / 255.0)[None, ..., None]
    logits = unet.apply(params, jnp.asarray(x), SMALL)[0]
    want = np.asarray(
        postprocess.postprocess_mask(decode.decode_mask(logits, 3))
    )
    np.testing.assert_array_equal(got, want)


def test_sliding_window_large_image(params):
    """128² via 64² windows, 32 overlap: runs, shape ok, mask values valid."""
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    mesh = pmesh.make_mesh(8)
    fn = tiles.make_tiled_pipeline(SMALL, window=64, overlap=32, mesh=mesh)
    got = np.asarray(fn(params, jnp.asarray(u8)))
    assert got.shape == (128, 128)
    assert set(np.unique(got)).issubset({0, 2})


def test_tiled_batch_matches_per_image(params):
    """The batched tiled program (one flat window batch + vmapped blend)
    must reproduce the per-image tiled pipeline exactly."""
    rng = np.random.default_rng(5)
    u8b = rng.integers(0, 256, size=(3, 128, 128), dtype=np.uint8)
    single = tiles.make_tiled_pipeline(SMALL, window=64, overlap=32,
                                       device_postprocess=False)
    batched = tiles.make_tiled_batch_pipeline(SMALL, window=64, overlap=32,
                                              device_postprocess=False)
    got = np.asarray(batched(params, jnp.asarray(u8b)))
    assert got.shape == (3, 128, 128)
    for i in range(3):
        want = np.asarray(single(params, jnp.asarray(u8b[i])))
        np.testing.assert_array_equal(got[i], want)

    # sharded variant agrees too
    mesh = pmesh.make_mesh(8)
    batched_sh = tiles.make_tiled_batch_pipeline(
        SMALL, window=64, overlap=32, mesh=mesh, device_postprocess=False)
    got_sh = np.asarray(batched_sh(params, jnp.asarray(u8b)))
    np.testing.assert_array_equal(got_sh, got)


def test_window_grid():
    assert tiles.window_grid(128, 64, 32) == [0, 32, 64]
    assert tiles.window_grid(100, 64, 32) == [0, 32, 36]
    assert tiles.window_grid(64, 64, 32) == [0]
    assert tiles.window_grid(30, 64, 32) == [0]


def test_dihedral_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.random((8, 8, 3)).astype(np.float32)
    for k in range(8):
        t = tta.dihedral(jnp.asarray(img), k)
        back = np.asarray(tta.dihedral_inverse(t, k))
        np.testing.assert_array_equal(back, img)


def test_tta_pipeline(params):
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    mesh = pmesh.make_mesh(8)
    fn = tta.make_tta_pipeline(SMALL, mesh=mesh)
    got = np.asarray(fn(params, jnp.asarray(u8)))
    assert got.shape == (64, 64)
    assert set(np.unique(got)).issubset({0, 2})
    # TTA of a symmetric input == plain inference decode path sanity
    fn2 = tta.make_tta_pipeline(SMALL)
    got2 = np.asarray(fn2(params, jnp.asarray(u8)))
    np.testing.assert_array_equal(got, got2)  # mesh must not change results


def test_sharded_train_step_runs_and_learns():
    cfg = ModelConfig(base_channels=4, depth=2, image_size=32,
                      compute_dtype="float32", remat=True)
    mesh = pmesh.make_mesh(8, sp=2)
    tx = train.make_optimizer(lr=1e-2, total_steps=100)
    state = train.init_state(jax.random.key(0), cfg, tx)
    step = train.make_sharded_train_step(cfg, mesh, tx)

    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray((rng.random((8, 32, 32)) > 0.5).astype(np.int32) * 2)

    losses = []
    for _ in range(5):
        state, loss = step(state, (imgs, labels))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it learns on a fixed batch
    assert int(state.step) == 5


def test_sharded_forward_matches_plain(params):
    mesh = pmesh.make_mesh(8)
    fwd = pbatch.make_sharded_forward(SMALL, mesh)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((8, 64, 64, 1)).astype(np.float32))
    got = np.asarray(fwd(params, x))
    want = np.asarray(unet.apply(params, x, SMALL))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mesh_helpers():
    mesh = pmesh.make_mesh(8, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    assert pmesh.batch_sharding(mesh).spec == ("dp",)
    assert pmesh.replicated(mesh).spec == ()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pmesh.make_mesh(8, sp=3)


def test_device_trace_writes(tmp_path):
    from unetseg_tpu.utils.profiling import device_trace

    with device_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    found = any(files for _, _, files in os.walk(tmp_path / "trace"))
    assert found  # profiler dumped something


def test_device_subset_engines_concurrent(tmp_path):
    """Two engines pinned to disjoint 4-device subsets serve concurrent
    callers and agree bit-for-bit with a single global engine — the
    reference's thread_local-context intent (src/process.cpp:15) without
    its shared-static-buffer race (SURVEY §5)."""
    import threading

    from unetseg_tpu import engine as eng_mod

    params = unet.init(jax.random.key(3), SMALL)
    devs = jax.devices()
    e_a = eng_mod.InferenceEngine(params, SMALL, devices=devs[:4])
    e_b = eng_mod.InferenceEngine(params, SMALL, devices=devs[4:])
    e_all = eng_mod.InferenceEngine(params, SMALL)

    rng = np.random.default_rng(7)
    u8_a = rng.integers(0, 256, size=(4, 64, 64), dtype=np.uint8)
    u8_b = rng.integers(0, 256, size=(4, 64, 64), dtype=np.uint8)

    # each subset engine computes on ITS devices only
    for e in (e_a, e_b):
        assert e.mesh is not None
        assert set(e.mesh.devices.flat) <= set(e.devices)
    assert set(e_a.devices).isdisjoint(e_b.devices)

    out = {}

    def run(name, e, u8):
        out[name] = np.asarray(e.infer(u8.copy()))

    threads = [threading.Thread(target=run, args=("a", e_a, u8_a)),
               threading.Thread(target=run, args=("b", e_b, u8_b))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    np.testing.assert_array_equal(out["a"], np.asarray(e_all.infer(u8_a)))
    np.testing.assert_array_equal(out["b"], np.asarray(e_all.infer(u8_b)))


def test_single_device_pinned_engine():
    """An engine pinned to one non-default device computes there."""
    from unetseg_tpu import engine as eng_mod

    params = unet.init(jax.random.key(3), SMALL)
    dev = jax.devices()[5]
    e = eng_mod.InferenceEngine(params, SMALL, devices=[dev])
    rng = np.random.default_rng(9)
    u8 = rng.integers(0, 256, size=(1, 64, 64), dtype=np.uint8)
    mask = e.infer(u8)
    assert mask.devices() == {dev}

    e_default = eng_mod.InferenceEngine(params, SMALL,
                                        devices=[jax.devices()[0]])
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(e_default.infer(u8)))


def test_tta_batch_matches_per_slice(params):
    """Batched 8-fold TTA (one program for N slices) == per-slice TTA."""
    fn1 = tta.make_tta_pipeline(SMALL, device_postprocess=False)
    fnb = tta.make_tta_batch_pipeline(SMALL, device_postprocess=False)
    rng = np.random.default_rng(17)
    u8 = rng.integers(0, 256, size=(3, 64, 64), dtype=np.uint8)
    got = np.asarray(fnb(params, jnp.asarray(u8)))
    want = np.stack([np.asarray(fn1(params, jnp.asarray(u8[i])))
                     for i in range(3)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cfg", [
    SMALL,
    ModelConfig(stem=2, depth=2, base_channels=8, image_size=64,
                compute_dtype="float32"),
    ModelConfig(stem=4, depth=2, base_channels=8, image_size=64,
                compute_dtype="float32"),
    ModelConfig(arch="attention_unet", depth=2, base_channels=8,
                image_size=64, compute_dtype="float32"),
    ModelConfig(arch="attention_unet", stem=2, depth=2, base_channels=8,
                image_size=64, compute_dtype="float32"),
    ModelConfig(arch="unetpp", depth=2, base_channels=8, image_size=64,
                compute_dtype="float32"),
    ModelConfig(arch="unetpp", depth=2, base_channels=8, image_size=64,
                compute_dtype="float32", deep_supervision=True),
], ids=["plain", "stem2", "stem4", "att", "att_stem2", "unetpp",
        "unetpp_ds"])
def test_weightspace_tta_matches_activation_tta(cfg):
    """Dihedral equivariance: 8 transformed-weight passes over the SAME
    input == the activation-space 8-view ensemble (logit-level check via
    identical masks; logits compared to fp tolerance)."""
    from unetseg_tpu.models import registry as model_registry

    params = model_registry.init(jax.random.key(5), cfg)
    rng = np.random.default_rng(23)
    u8 = rng.integers(0, 256, size=(2, 64, 64), dtype=np.uint8)
    x = (u8.astype(np.float32) / 255.0)[..., None]

    # activation-space reference logits
    ref = np.zeros((2, 64, 64, cfg.num_classes), np.float32)
    for k in range(tta.N_TRANSFORMS):
        xv = np.stack([np.asarray(tta.dihedral(jnp.asarray(x[i, ..., 0]), k))
                       for i in range(2)])[..., None]
        lg = np.asarray(model_registry.apply(params, jnp.asarray(xv), cfg))
        ref += np.stack([np.asarray(tta.dihedral_inverse(jnp.asarray(lg[i]), k))
                         for i in range(2)])
    ref /= tta.N_TRANSFORMS

    ws = np.zeros_like(ref)
    for k in range(tta.N_TRANSFORMS):
        th = tta.transform_params_dihedral(params, cfg, k)
        ws += np.asarray(model_registry.apply(th, jnp.asarray(x), cfg))
    ws /= tta.N_TRANSFORMS
    np.testing.assert_allclose(ws, ref, atol=2e-4, rtol=1e-3)

    fn = tta.make_tta_weightspace_pipeline(cfg)
    fn1 = tta.make_tta_pipeline(cfg, device_postprocess=False)
    got = np.asarray(fn(params, jnp.asarray(u8)))
    want = np.stack([np.asarray(fn1(params, jnp.asarray(u8[i])))
                     for i in range(2)])
    np.testing.assert_array_equal(got, want)


def test_blend_overlap_add_matches_padded_stack():
    """The regular-grid overlap-add fast path must equal the general
    pad-and-stack blend (same Hann weights, same normalizer)."""
    import numpy as np

    rng = np.random.default_rng(0)
    h = w = 128
    window, stride = 64, 32  # regular: stride | window, uniform grid
    ys = tiles.window_grid(h, window, stride)
    xs = tiles.window_grid(w, window, stride)
    assert tiles._regular_grid(ys, stride, window)
    n = len(ys) * len(xs)
    lt = jnp.asarray(rng.standard_normal((n, window, window, 3)),
                     jnp.float32)
    fast = tiles.blend_windows(lt, h, w, window, stride)
    # force the fallback by calling the padded-stack arithmetic directly
    weight = jnp.asarray(tiles._hann_weight(window))[..., None]
    padded = [
        jax.lax.pad(lt[k] * weight, jnp.float32(0),
                    ((y, h - window - y, 0), (x, w - window - x, 0),
                     (0, 0, 0)))
        for k, (y, x) in enumerate((y, x) for y in ys for x in xs)
    ]
    slow = (jnp.sum(jnp.stack(padded), axis=0)
            * jnp.asarray(tiles._inv_weight_sum(h, w, window, stride)))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-5)


def test_blend_irregular_grid_falls_back(params):
    """Edge-clamped (irregular) grids still blend correctly end-to-end."""
    import numpy as np

    # 96² with window 64, stride 48 -> starts [0, 32] (clamped): irregular
    ys = tiles.window_grid(96, 64, 48)
    assert not tiles._regular_grid(ys, 48, 64)
    fn = tiles.make_tiled_pipeline(SMALL, window=64, overlap=16,
                                   device_postprocess=False)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    m = np.asarray(fn(params, jnp.asarray(u8)))
    assert m.shape == (96, 96) and set(np.unique(m)) <= {0, 1, 2}


# -- round-4 review fixes (tiles library hardening) ---------------------------

def test_tiles_small_image_edge_pads(params):
    """Images smaller than one window edge-pad inside the LIBRARY (the
    engine previously carried a private workaround; bare library calls
    crashed at trace time with an out-of-bounds lax.slice)."""
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, size=(40, 96), dtype=np.uint8)  # H < window
    fn = tiles.make_tiled_pipeline(SMALL, window=64, overlap=0)
    got = np.asarray(fn(params, jnp.asarray(u8)))
    assert got.shape == (40, 96)
    # logits path too
    lg = tiles.sliding_window_logits(
        params, jnp.asarray(u8.astype(np.float32) / 255.0), SMALL, window=64,
        overlap=0)
    assert lg.shape == (40, 96, 3)
    # batched
    u8b = rng.integers(0, 256, size=(2, 40, 40), dtype=np.uint8)
    fb = tiles.make_tiled_batch_pipeline(SMALL, window=64, overlap=0)
    assert np.asarray(fb(params, jnp.asarray(u8b))).shape == (2, 40, 40)


def test_tiles_default_overlap_is_half_window(params):
    """overlap=None (the new default) == window//2 — the stale 128 default
    contradicted the documented fast-path default and made the overlap-add
    blend unreachable at defaults."""
    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    got_default = np.asarray(
        tiles.make_tiled_pipeline(SMALL, window=64)(params, jnp.asarray(u8)))
    got_half = np.asarray(
        tiles.make_tiled_pipeline(SMALL, window=64, overlap=32)(
            params, jnp.asarray(u8)))
    np.testing.assert_array_equal(got_default, got_half)


def test_tiles_invalid_overlap_rejected():
    for bad in (-1, 64, 65):
        with pytest.raises(ValueError):
            tiles.make_tiled_pipeline(SMALL, window=64, overlap=bad)
        with pytest.raises(ValueError):
            tiles.make_tiled_batch_pipeline(SMALL, window=64, overlap=bad)


def test_sharded_distill_step_with_boundary_boost():
    """make_sharded_train_step(distill=True, boundary_boost=...) — the
    shipped checkpoint's actual recipe through the sharded path (round-4
    review: only the plain step was previously reachable here)."""
    cfg = ModelConfig(base_channels=4, depth=2, image_size=32,
                      compute_dtype="float32")
    mesh = pmesh.make_mesh(8, sp=2)
    tx = train.make_optimizer(lr=1e-2, total_steps=50)
    state = train.init_state(jax.random.key(0), cfg, tx)
    step = train.make_sharded_train_step(cfg, mesh, tx, distill=True,
                                         boundary_boost=3.0)

    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray((rng.random((8, 32, 32)) > 0.5).astype(np.int32) * 2)
    t_logits = jnp.asarray(rng.random((8, 32, 32, 3)).astype(np.float32))

    losses = []
    for _ in range(4):
        state, loss = step(state, (imgs, labels, t_logits))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
