"""Engine-surface mesh wiring (VERDICT r3 item 3).

The library mesh variants were always tested (test_parallel.py); these tests
pin the PRODUCT surface: an InferenceEngine constructed on a multi-device
host must shard its batch, TTA and sliding-window paths over its dp mesh and
produce masks identical to a single-device engine's.
"""

import jax
import numpy as np
import pytest

from unetseg_tpu import engine as peng
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")
SLIM = ModelConfig(base_channels=8, depth=2, image_size=64,
                   compute_dtype="float32", stem=2)


@pytest.fixture(scope="module", params=[SMALL, SLIM],
                ids=["stem1", "stem2"])
def engines(request):
    cfg = request.param
    params = jax.jit(model_registry.init, static_argnums=(1,))(
        jax.random.key(3), cfg)
    multi = peng.InferenceEngine(params, cfg)                  # all 8 devices
    single = peng.InferenceEngine(params, cfg,
                                  devices=[jax.devices()[0]])
    assert multi.mesh is not None and single.mesh is None
    return multi, single


def _u8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


def test_engine_batch_mesh_matches_single(engines):
    multi, single = engines
    u8 = _u8((8, 64, 64))
    np.testing.assert_array_equal(
        np.asarray(multi.infer(u8.copy())), np.asarray(single.infer(u8)))


def test_engine_tta_mesh_matches_single(engines):
    multi, single = engines
    u8 = _u8((64, 64), seed=1)
    np.testing.assert_array_equal(
        np.asarray(multi.infer_tta(u8)), np.asarray(single.infer_tta(u8)))


def test_engine_tiled_mesh_matches_single(engines):
    multi, single = engines
    u8 = _u8((96, 96), seed=2)
    np.testing.assert_array_equal(
        np.asarray(multi.infer_tiled(u8, window=64, overlap=16)),
        np.asarray(single.infer_tiled(u8, window=64, overlap=16)))


def test_engine_tta_mesh_uses_weightspace_mesh_pipeline(engines):
    """The UNet arch must select the dp-sharded weight-space ensemble."""
    multi, _ = engines
    u8 = _u8((64, 64), seed=3)
    multi.infer_tta(u8)
    kind, _fn = multi._compiled[("tta", u8.shape)]
    assert kind == "ws"


def test_threaded_callers_with_partitioned_engines(tmp_path):
    """The bare-API realization of the reference's thread_local-context
    intent (src/process.cpp:14-19): N threads, each owning a partition
    engine, call process_single_image concurrently and all succeed with
    correct artifacts."""
    import threading

    from unetseg_tpu import checkpoint, data, engine
    from unetseg_tpu.io import raw as raw_io

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(model_registry.init, static_argnums=(1,))(
        jax.random.key(7), cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        raw, _ = data.synth_slice(rng, 512)
        p = str(tmp_path / f"t{i}_512_512.raw")
        raw_io.write_raw(p, raw)
        paths.append(p)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        engines = engine.make_partitioned_engines(4)
        assert len(engines) == 4
        # disjoint device subsets
        owned = [d for e in engines for d in e.devices]
        assert len(owned) == len(set(owned)) == 8
        results = [None] * 4

        def worker(i):
            results[i] = engine.process_single_image(
                paths[i], 512, 512, str(tmp_path / f"o{i}"), eng=engines[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(results), results
        import os
        for i in range(4):
            assert os.path.exists(
                str(tmp_path / f"o{i}" / f"t{i}_512_512_mask.png"))
    finally:
        engine.cleanup_resources()
