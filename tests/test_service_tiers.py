"""Service-side artifact tiers: {"tier": ...} on directory process requests."""

import numpy as np
import pytest

from unetseg_tpu import checkpoint, service
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.io import raw as raw_io

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")


@pytest.fixture()
def svc(tmp_path):
    s = service.SegmentationService(port=0)
    addr = s.start()
    yield s, addr, tmp_path
    s.stop()


def test_service_tier_json(svc):
    s, addr, tmp_path = svc
    cache = tmp_path / "model.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    (tmp_path / "data").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        raw_io.write_raw(str(tmp_path / "data" / f"s{i}.raw"),
                         rng.integers(0, 65536, (64, 64), np.uint16))
    assert service.request(addr, {"cmd": "init", "cache": str(cache)})["ok"]

    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data"),
        "width": 64, "height": 64, "output_dir": str(tmp_path / "out"),
        "tier": "json"})
    assert r["ok"] and r["processed"] == 2
    assert (tmp_path / "out" / "s0.json").exists()
    assert (tmp_path / "out" / "s0_original_sizes.json").exists()
    assert not (tmp_path / "out" / "s0_mask.png").exists()
    assert not (tmp_path / "out" / "s0_normalized.png").exists()

    # invalid tier -> clean per-request error, service survives
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data"),
        "width": 64, "height": 64, "output_dir": str(tmp_path / "out2"),
        "tier": "everything"})
    assert not r["ok"] and "tier" in r["error"]
    assert service.request(addr, {"cmd": "status"})["ok"]
