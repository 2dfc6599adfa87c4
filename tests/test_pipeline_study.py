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
