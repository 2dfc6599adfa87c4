"""Native batched artifact emission (csrc/emit.cpp) + packed postprocess.

Parity contract of the fast study-emit path (VERDICT r3 item 2):
* PNGs are pixel-identical to the cv2-written engine artifacts (bytes are a
  different—valid—encoding: stored-deflate level 0, the reference's own
  compression choice, src/preprocess.cpp:122);
* JSON artifacts are byte-identical to the golden-tested emitters;
* the contour overlay reproduces cv2.drawContours' red pixel set exactly
  (8-connected Bresenham, thickness 1, closed polygons,
  src/mask2polygon.cpp:114-129);
* 2-bit-packed mask cleanup equals unpack + postprocess.
"""

import os

import numpy as np
import pytest

from unetseg_tpu import data
from unetseg_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def slice_fix():
    rng = np.random.default_rng(77)
    raw, lab = data.synth_slice(rng, 512)
    u8 = native.preprocess_u8(raw, 512)
    clean = native.postprocess_batch(lab[None])[0]
    vis = np.where(clean == 2, 255, np.where(clean == 1, 128, 0)).astype(np.uint8)
    return u8, clean, vis


def _decode_gray(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_GRAYSCALE)
    assert img is not None, path
    return img


def test_full_tier_pixel_and_byte_parity(slice_fix, tmp_path):
    import cv2

    u8, clean, vis = slice_fix
    td = str(tmp_path)
    counts = native.emit_batch(u8[None], clean[None], [td], ["s0"],
                               ["s0.raw"], 1024, 768, native.TIER_FULL)
    assert counts.tolist() == [len(native.extract_contours(vis))]

    assert np.array_equal(_decode_gray(td + "/s0_normalized.png"), u8)
    assert np.array_equal(_decode_gray(td + "/s0_mask.png"), vis)

    with open(td + "/s0_original_sizes.json", "rb") as f:
        assert f.read() == native.size_json_bytes("s0.raw", 1024, 768, 512, 512)

    cs = native.extract_contours(vis)
    with open(td + "/s0.json", "rb") as f:
        assert f.read() == native.contour_json_bytes(
            cs, "s0", 1024, 768, 1024 / 512, 768 / 512)

    # overlay: same red pixel set as cv2.drawContours on the same contours
    ov = cv2.imread(td + "/s0_contour_overlay.png")
    ref = cv2.cvtColor(u8, cv2.COLOR_GRAY2BGR)
    cv2.drawContours(ref, [np.asarray(c, np.int32).reshape(-1, 1, 2)
                           for c in cs], -1, (0, 0, 255), 1)
    assert np.array_equal(ov, ref)


def test_tier_subsets(slice_fix, tmp_path):
    u8, clean, _ = slice_fix
    td_json = str(tmp_path / "j")
    td_mask = str(tmp_path / "m")
    os.makedirs(td_json), os.makedirs(td_mask)
    native.emit_batch(u8[None], clean[None], [td_json], ["s"], ["s.raw"],
                      512, 512, native.TIER_JSON)
    assert sorted(os.listdir(td_json)) == ["s.json", "s_original_sizes.json"]
    native.emit_batch(u8[None], clean[None], [td_mask], ["s"], ["s.raw"],
                      512, 512, native.TIER_MASK_JSON)
    assert sorted(os.listdir(td_mask)) == [
        "s.json", "s_mask.png", "s_original_sizes.json"]


def test_empty_mask_skips_contour_artifacts(tmp_path):
    """Reference parity: no contours -> no overlay, no contour JSON
    (src/mask2polygon.cpp:183-188), but size JSON + PNGs still written."""
    u8 = np.full((512, 512), 7, np.uint8)
    clean = np.zeros((512, 512), np.uint8)
    td = str(tmp_path)
    counts = native.emit_batch(u8[None], clean[None], [td], ["e"], ["e.raw"],
                               512, 512, native.TIER_FULL)
    assert counts.tolist() == [0]
    assert sorted(os.listdir(td)) == [
        "e_mask.png", "e_normalized.png", "e_original_sizes.json"]


def test_degenerate_dims_report_failure(tmp_path):
    """Zero-area slices cannot be emitted (zero-area PNGs are invalid per
    the PNG spec): the slice must report -1 (failure), not a fabricated
    contour count, and write nothing."""
    u8 = np.empty((1, 0, 512), np.uint8)
    clean = np.empty((1, 0, 512), np.uint8)
    td = str(tmp_path)
    counts = native.emit_batch(u8, clean, [td], ["z"], ["z.raw"],
                               512, 512, native.TIER_FULL)
    assert counts.tolist() == [-1]
    assert os.listdir(td) == []


def test_emit_batch_multi_slice(slice_fix, tmp_path):
    u8, clean, vis = slice_fix
    n = 4
    td = str(tmp_path)
    counts = native.emit_batch(
        np.stack([u8] * n), np.stack([clean] * n), [td] * n,
        [f"s{i}" for i in range(n)], [f"s{i}.raw" for i in range(n)],
        512, 512, native.TIER_MASK_JSON)
    assert (counts >= 1).all()
    for i in range(n):
        assert np.array_equal(_decode_gray(td + f"/s{i}_mask.png"), vis)


def test_packed_postprocess_matches_unpacked():
    rng = np.random.default_rng(3)
    masks = np.stack([data.synth_slice(rng, 256)[1] for _ in range(3)])
    m = masks.reshape(3, 256, 64, 4)
    packed = (m[..., 0] | (m[..., 1] << 2) | (m[..., 2] << 4)
              | (m[..., 3] << 6)).astype(np.uint8)
    out = native.postprocess_packed_batch(packed, 256)
    assert np.array_equal(out, native.postprocess_batch(masks))


def test_preprocess_same_size_fast_path_bit_exact():
    """h == w == out_size triggers the LUT fast path; must stay bit-exact
    with the f64 oracle (the general bilinear path is differential-tested
    in test_preprocess.py)."""
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 65536, (512, 512), np.uint16)
    assert np.array_equal(native.preprocess_u8(raw, 512),
                          preprocess_oracle_u8(raw, 512))
    const = np.full((512, 512), 4242, np.uint16)
    assert np.array_equal(native.preprocess_u8(const, 512),
                          preprocess_oracle_u8(const, 512))
    narrow = rng.integers(1000, 1003, (512, 512), np.uint16)
    assert np.array_equal(native.preprocess_u8(narrow, 512),
                          preprocess_oracle_u8(narrow, 512))


def test_run_study_artifact_tiers(tmp_path):
    """End-to-end: run_study(artifacts=...) writes per-slice artifacts whose
    mask PNGs decode to exactly the cleaned masks it reports."""
    import jax

    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry as model_registry
    from unetseg_tpu.parallel import pipeline as ppl

    rng = np.random.default_rng(21)
    paths = []
    for i in range(5):
        raw, _ = data.synth_slice(rng, 512)
        p = str(tmp_path / f"sl{i}.raw")
        raw_io.write_raw(p, raw)
        paths.append(p)

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(model_registry.init, static_argnums=(1,))(
        jax.random.key(0), cfg)
    out_dir = str(tmp_path / "out")
    res = ppl.run_study(params, cfg, paths, 512, 512, batch_size=2,
                        host_preprocess=True, keep_masks=True,
                        artifacts="full", out_dir=out_dir)
    assert res.n_slices == 5
    for i, p in enumerate(paths):
        vis = np.where(res.masks[i] == 2, 255,
                       np.where(res.masks[i] == 1, 128, 0)).astype(np.uint8)
        assert np.array_equal(_decode_gray(out_dir + f"/sl{i}_mask.png"), vis)
        assert os.path.exists(out_dir + f"/sl{i}_normalized.png")
        assert os.path.exists(out_dir + f"/sl{i}_original_sizes.json")
    with pytest.raises(ValueError):
        ppl.run_study(params, cfg, paths, 512, 512, artifacts="full",
                      out_dir=out_dir)  # host_preprocess required


def test_run_study_per_class_matches_engine(tmp_path):
    """run_study(per_class=True) emits {base}_classes.json byte-identical
    to the engine's serial per-class artifact (decoded PRE-cleanup mask)."""
    import jax

    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry as model_registry
    from unetseg_tpu.parallel import pipeline as ppl

    rng = np.random.default_rng(31)
    paths = []
    for i in range(3):
        raw, _ = data.synth_slice(rng, 512)
        p = str(tmp_path / f"sl{i}_512_512.raw")
        raw_io.write_raw(p, raw)
        paths.append(p)

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(model_registry.init, static_argnums=(1,))(
        jax.random.key(4), cfg)
    out_dir = str(tmp_path / "out")
    res = ppl.run_study(params, cfg, paths, 512, 512, batch_size=2,
                        host_preprocess=True, artifacts="json",
                        out_dir=out_dir, per_class=True)
    assert res.n_slices == 3

    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        for i, p in enumerate(paths):
            assert engine.process_single_image(p, 512, 512,
                                               str(tmp_path / "serial"),
                                               per_class=True)
            got = open(out_dir + f"/sl{i}_512_512_classes.json", "rb").read()
            want = open(str(tmp_path / "serial" /
                            f"sl{i}_512_512_classes.json"), "rb").read()
            assert got == want, i
    finally:
        engine.cleanup_resources()
    with pytest.raises(ValueError, match="per_class"):
        ppl.run_study(params, cfg, paths, 512, 512, host_preprocess=True,
                      per_class=True)  # artifacts required


def test_process_batch_native_emitter_matches_cv2(tmp_path):
    """engine.process_batch(emitter='native') must produce pixel-identical
    PNGs and byte-identical JSONs to the default cv2 path (overlay bytes
    differ by encoder; pixels compared)."""
    import jax

    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io
    from unetseg_tpu.models import registry

    cfg = ModelConfig(base_channels=8, depth=2)
    params = jax.jit(registry.init, static_argnums=(1,))(jax.random.key(2),
                                                         cfg)
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, jax.tree_util.tree_map(np.asarray, params), cfg)
    rng = np.random.default_rng(8)
    paths = []
    for i in range(3):
        raw, _ = data.synth_slice(rng, 512)
        p = str(tmp_path / f"b{i}_512_512.raw")
        raw_io.write_raw(p, raw)
        paths.append(p)
    try:
        assert engine.initialize_engine(ckpt, log_dir=str(tmp_path / "log"))
        o_cv, o_nat = str(tmp_path / "cv"), str(tmp_path / "nat")
        ok1, f1 = engine.process_batch(paths, 512, 512, [o_cv] * 3,
                                       batch_size=2)
        ok2, f2 = engine.process_batch(paths, 512, 512, [o_nat] * 3,
                                       batch_size=2, emitter="native")
        assert (ok1, f1) == (3, 0) and (ok2, f2) == (3, 0)
        import cv2

        for i in range(3):
            b = f"b{i}_512_512"
            for suffix in ("_normalized.png", "_mask.png"):
                a = cv2.imread(f"{o_cv}/{b}{suffix}", cv2.IMREAD_UNCHANGED)
                c = cv2.imread(f"{o_nat}/{b}{suffix}", cv2.IMREAD_UNCHANGED)
                assert np.array_equal(a, c), (b, suffix)
            with open(f"{o_cv}/{b}_original_sizes.json", "rb") as fa, \
                    open(f"{o_nat}/{b}_original_sizes.json", "rb") as fb:
                assert fa.read() == fb.read()
            # contour JSON + overlay exist iff contours found, in BOTH paths
            assert os.path.exists(f"{o_cv}/{b}.json") == \
                os.path.exists(f"{o_nat}/{b}.json")
            if os.path.exists(f"{o_cv}/{b}.json"):
                with open(f"{o_cv}/{b}.json", "rb") as fa, \
                        open(f"{o_nat}/{b}.json", "rb") as fb:
                    assert fa.read() == fb.read()
                a = cv2.imread(f"{o_cv}/{b}_contour_overlay.png")
                c = cv2.imread(f"{o_nat}/{b}_contour_overlay.png")
                assert np.array_equal(a, c)
    finally:
        engine.cleanup_resources()
