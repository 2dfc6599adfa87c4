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
