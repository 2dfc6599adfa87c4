"""Per-class contour surface (VERDICT r3 item 5, BASELINE config 2).

``{base}_classes.json`` extends the reference's labelme schema with real
per-shape ``label`` / ``labelIndex`` values (the reference hardcodes 1/0,
src/mask2polygon.cpp:86-88).  Byte format is pinned by a golden; the C++
emitter must match the Python/nlohmann emitter byte-for-byte.
"""

import json
import os

import jax
import numpy as np
import pytest

from unetseg_tpu import data
from unetseg_tpu.io import jsonfmt, native

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

LABELED = [(1, 0, [(10, 12), (30, 12), (30, 40)]),
           (2, 1, [(100, 100), (140, 100), (140, 140), (100, 140)]),
           (2, 1, [(5, 5), (6, 5), (6, 6)])]


def test_labeled_json_matches_golden():
    scaled = [(lab, idx, [(int(x * 2.0), int(y * 1.5)) for x, y in c])
              for lab, idx, c in LABELED]
    got = jsonfmt.contour_json_bytes_labeled(scaled, "ml", 1024, 768)
    with open(os.path.join(GOLDEN, "contour_labeled_golden.json"), "rb") as f:
        assert got == f.read()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_labeled_json_matches_python():
    got_c = native.contour_json_bytes_labeled(LABELED, "ml", 1024, 768,
                                              2.0, 1.5)
    with open(os.path.join(GOLDEN, "contour_labeled_golden.json"), "rb") as f:
        assert got_c == f.read()
    # empty set serializes too
    empty = native.contour_json_bytes_labeled([], "e", 64, 64, 1.0, 1.0)
    assert json.loads(empty)["shapes"] == []


def test_engine_per_class_artifact(tmp_path):
    """process_single_image(per_class=True) emits {base}_classes.json with
    one labelIndex per class and scaled integer points."""
    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(0),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)

    raw, _ = data.synth_slice(np.random.default_rng(5), 512)
    rp = str(tmp_path / "img_512_512.raw")
    raw_io.write_raw(rp, raw)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        assert engine.process_single_image(rp, 512, 512,
                                           str(tmp_path / "o"),
                                           per_class=True)
        pcp = str(tmp_path / "o" / "img_512_512_classes.json")
        assert os.path.exists(pcp)
        doc = json.loads(open(pcp).read())
        assert doc["imageWidth"] == 512 and doc["imageHeight"] == 512
        for shape in doc["shapes"]:
            assert shape["label"] in (1, 2)
            assert shape["labelIndex"] in (0, 1)
            assert shape["shape_type"] == "polygon"
        # labelIndex consistently maps the sorted class list
        lab2idx = {s["label"]: s["labelIndex"] for s in doc["shapes"]}
        for lab, idx in lab2idx.items():
            assert idx == {1: 0, 2: 1}[lab]
    finally:
        engine.cleanup_resources()


def test_engine_per_class_composes_with_tta_and_window(tmp_path):
    """per_class composes with the other inference modes: the class JSON is
    emitted from the decoded (pre-cleanup) mask whichever path produced it
    (engine.py runs _emit_per_class_json before cleanup_masks for the
    plain, TTA, and sliding-window branches alike)."""
    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(2),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)
    raw, _ = data.synth_slice(np.random.default_rng(7), 256)
    rp = str(tmp_path / "img_256_256.raw")
    raw_io.write_raw(rp, raw)

    def check(doc):
        assert doc["imageWidth"] == 256 and doc["imageHeight"] == 256
        for shape in doc["shapes"]:
            assert shape["label"] in (1, 2)
            assert shape["labelIndex"] == {1: 0, 2: 1}[shape["label"]]
            for x, y in shape["points"]:
                assert isinstance(x, int) and 0 <= x < 256
                assert isinstance(y, int) and 0 <= y < 256

    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        assert engine.process_single_image(rp, 256, 256,
                                           str(tmp_path / "t"),
                                           tta=True, per_class=True)
        check(json.loads(open(
            str(tmp_path / "t" / "img_256_256_classes.json")).read()))
        assert engine.process_single_image(rp, 256, 256,
                                           str(tmp_path / "w"),
                                           window=128, per_class=True)
        check(json.loads(open(
            str(tmp_path / "w" / "img_256_256_classes.json")).read()))
    finally:
        engine.cleanup_resources()


def test_service_per_class_field(tmp_path):
    """The service's process request forwards per_class to the engine."""
    from unetseg_tpu import checkpoint, service
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(1),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)
    raw, _ = data.synth_slice(np.random.default_rng(6), 512)
    rp = str(tmp_path / "img_512_512.raw")
    raw_io.write_raw(rp, raw)

    svc = service.SegmentationService(port=0)
    addr = svc.start()
    try:
        assert service.request(addr, {"cmd": "init", "cache": ckpt})["ok"]
        resp = service.request(addr, {
            "cmd": "process", "path": rp, "width": 512, "height": 512,
            "output_dir": str(tmp_path / "o"), "per_class": True})
        assert resp["ok"], resp
        assert os.path.exists(str(tmp_path / "o" / "img_512_512_classes.json"))
    finally:
        svc.stop()


def test_batched_per_class_matches_serial(tmp_path):
    """process_batch(per_class=True) emits per-slice {base}_classes.json
    byte-identical to the serial path's, for both emitters."""
    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(2),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)

    rng = np.random.default_rng(9)
    paths = []
    for i in range(3):
        raw, _ = data.synth_slice(rng, 512)
        rp = str(tmp_path / f"s{i}_512_512.raw")
        raw_io.write_raw(rp, raw)
        paths.append(rp)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        for f in paths:
            assert engine.process_single_image(f, 512, 512,
                                               str(tmp_path / "serial"),
                                               per_class=True)
        for emitter in ("cv2", "native"):
            out = str(tmp_path / f"batched_{emitter}")
            ok, fail = engine.process_batch(
                paths, 512, 512, [out] * len(paths), batch_size=2,
                emitter=emitter, per_class=True)
            assert (ok, fail) == (3, 0)
            for i in range(3):
                got = open(os.path.join(out, f"s{i}_512_512_classes.json"),
                           "rb").read()
                want = open(str(tmp_path / "serial" /
                                f"s{i}_512_512_classes.json"), "rb").read()
                assert got == want, (emitter, i)
    finally:
        engine.cleanup_resources()


def test_per_class_rejects_device_postprocess(tmp_path):
    """All-device engines serve CLEANED masks — per-class extraction would
    be silently wrong (class 1 erased), so both paths must refuse."""
    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(3),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)
    raw, _ = data.synth_slice(np.random.default_rng(4), 512)
    rp = str(tmp_path / "img_512_512.raw")
    raw_io.write_raw(rp, raw)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"),
                                        device_postprocess=True)
        # per-image isolation: the error is surfaced and the image fails
        assert not engine.process_single_image(rp, 512, 512,
                                               str(tmp_path / "o"),
                                               per_class=True)
        assert not os.path.exists(
            str(tmp_path / "o" / "img_512_512_classes.json"))
        with pytest.raises(ValueError, match="per_class"):
            engine.process_batch([rp], 512, 512, [str(tmp_path / "o")],
                                 per_class=True)
    finally:
        engine.cleanup_resources()
