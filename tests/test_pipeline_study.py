"""Study runner (BASELINE config 4) on the CPU backend."""

import numpy as np

import jax

from unetseg_tpu import train
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.io import native, raw as raw_io
from unetseg_tpu.models import unet
from unetseg_tpu.ops import decode, preprocess
from unetseg_tpu.parallel import pipeline

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64, compute_dtype="float32")


def test_run_study_matches_direct(tmp_path):
    params = unet.init(jax.random.key(0), SMALL)
    rng = np.random.default_rng(0)
    w, h = 96, 80
    paths = []
    raws = []
    for i in range(7):  # odd count: exercises ragged-tail padding
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        p = tmp_path / f"s{i}.raw"
        raw_io.write_raw(str(p), img)
        paths.append(str(p))
        raws.append(img)

    emitted = {}

    def emit(k, path, mask):
        emitted[k] = mask.copy()

    res = pipeline.run_study(
        params, SMALL, paths, w, h, batch_size=3, emit=emit, keep_masks=True
    )
    assert res.n_slices == 7 and res.slices_per_sec > 0
    assert sorted(emitted) == list(range(7))

    # direct single-slice oracle
    for k in range(7):
        u8, x = preprocess.preprocess_batch(np.asarray(raws[k])[None], 64)
        logits = unet.apply(params, x, SMALL)
        mask = np.asarray(decode.decode_mask(logits, 3))[0]
        want = native.postprocess_batch(mask)
        np.testing.assert_array_equal(res.masks[k], want)
        np.testing.assert_array_equal(emitted[k], want)


def test_p50_latency_smoke():
    params = unet.init(jax.random.key(0), SMALL)
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 65536, size=(80, 96), dtype=np.uint16)
    p50 = pipeline.measure_p50_latency(params, SMALL, raw, 96, 80, iters=3)
    assert p50 > 0


def test_stage_timer_and_trace():
    from unetseg_tpu.utils.profiling import StageTimer, device_trace

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2 and s["b"]["calls"] == 1
    with device_trace(None):  # no-op path
        pass
    t.reset()
    assert t.summary() == {}


def test_run_study_host_preprocess_matches(tmp_path):
    """host_preprocess=True ships bit-exact u8 (half the H2D bytes); masks
    agree with the device-preprocess path."""
    import numpy as np

    from unetseg_tpu import checkpoint
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.parallel import pipeline

    cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                      compute_dtype="float32")
    import jax

    params = jax.jit(
        __import__("unetseg_tpu.models.registry", fromlist=["init"]).init,
        static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = tmp_path / f"s{i}.raw"
        raw_io.write_raw(str(p), rng.integers(0, 65536, (70, 90), np.uint16))
        paths.append(str(p))

    r0 = pipeline.run_study(params, cfg, paths, 90, 70, batch_size=2,
                            keep_masks=True)
    r1 = pipeline.run_study(params, cfg, paths, 90, 70, batch_size=2,
                            keep_masks=True, host_preprocess=True)
    # device f32 preprocess vs bit-exact host path: <=1 gray-level input
    # differences; masks must agree to the IoU bar
    a, b = r0.masks > 0, r1.masks > 0
    union = np.logical_or(a, b).sum()
    inter = np.logical_and(a, b).sum()
    assert union == 0 or inter / union >= 0.999


def test_device_resident_matches_run_study(tmp_path):
    """run_study_device_resident produces byte-identical artifacts and
    identical cleaned masks to run_study — same pipeline, transport staged
    out of the timed window (VERDICT r4 item 5)."""
    import filecmp
    import os

    params = unet.init(jax.random.key(0), SMALL)
    rng = np.random.default_rng(5)
    w, h = 96, 80
    paths = []
    for i in range(7):  # ragged tail: 7 slices, batch 3
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        p = tmp_path / f"s{i}.raw"
        raw_io.write_raw(str(p), img)
        paths.append(str(p))

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    res_a = pipeline.run_study(params, SMALL, paths, w, h, batch_size=3,
                               host_preprocess=True, keep_masks=True,
                               artifacts="json", out_dir=out_a)
    res_b = pipeline.run_study_device_resident(
        params, SMALL, paths, w, h, batch_size=3, artifacts="json",
        out_dir=out_b, keep_masks=True)
    np.testing.assert_array_equal(res_a.masks, res_b.masks)
    assert res_b.stage_s > 0 and res_b.slices_per_sec > 0
    # device_postprocess variant: on-chip v4 cleanup + 1-bit masks must
    # reproduce the host-cleanup artifacts byte-for-byte
    out_c = str(tmp_path / "c")
    res_c = pipeline.run_study_device_resident(
        params, SMALL, paths, w, h, batch_size=3, artifacts="json",
        out_dir=out_c, keep_masks=True, device_postprocess=True)
    np.testing.assert_array_equal(res_a.masks, res_c.masks)
    files = sorted(os.listdir(out_a))
    assert files == sorted(os.listdir(out_b)) == sorted(os.listdir(out_c))
    assert files
    for f in files:
        assert filecmp.cmp(os.path.join(out_a, f), os.path.join(out_b, f),
                           shallow=False), f
        assert filecmp.cmp(os.path.join(out_a, f), os.path.join(out_c, f),
                           shallow=False), f


def test_device_resident_no_artifacts():
    """artifacts=None measures the artifact-free floor; out_dir unneeded."""
    params = unet.init(jax.random.key(0), SMALL)
    rng = np.random.default_rng(6)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(4):
            img = rng.integers(0, 65536, size=(80, 96), dtype=np.uint16)
            p = f"{td}/s{i}.raw"
            raw_io.write_raw(p, img)
            paths.append(p)
        res = pipeline.run_study_device_resident(
            params, SMALL, paths, 96, 80, batch_size=4, artifacts=None,
            keep_masks=True)
        assert res.n_slices == 4 and res.masks.shape == (4, 64, 64)
