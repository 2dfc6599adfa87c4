"""Confidence-cascade serving: router statistic + engine routing.

The cascade re-runs slices whose boundary-margin confidence
(unetseg_tpu/ops/confidence.py) falls below a threshold through a stronger
fallback model (engine.attach_cascade / infer_cascade).  The reference has
no analog — its accuracy tail lives inside the opaque .trt artifact — so
these tests pin OUR semantics: the statistic itself, the routing splice,
and the two degenerate thresholds (route-none == plain infer,
route-all == fallback model everywhere).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from unetseg_tpu import checkpoint, engine
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.ops import confidence

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")
BIG = ModelConfig(base_channels=12, depth=2, image_size=64,
                  compute_dtype="float32")


# -- router statistic ------------------------------------------------------

def test_margin_map_is_top1_minus_top2():
    logits = jnp.asarray([[[[3.0, 1.0, 0.5], [0.2, 0.9, 0.8]]]])
    m = confidence.margin_map(logits)
    np.testing.assert_allclose(np.asarray(m), [[[2.0, 0.1]]], rtol=1e-6)


def test_boundary_band_is_mask_rim():
    mask = np.zeros((1, 16, 16), np.uint8)
    mask[0, 4:12, 4:12] = 2
    band = np.asarray(confidence.boundary_band(jnp.asarray(mask)))
    # interior pixels (eroded square) and far-away background are NOT band
    assert not band[0, 8, 8]
    assert not band[0, 0, 0]
    # the rim and its 1-px neighborhood are
    assert band[0, 4, 4] and band[0, 3, 4] and band[0, 12, 8]


def test_boundary_margin_scores_rim_only():
    # high margin everywhere except a low-margin rim -> score ~ rim margin
    mask = np.zeros((1, 16, 16), np.uint8)
    mask[0, 4:12, 4:12] = 2
    logits = np.zeros((1, 16, 16, 3), np.float32)
    logits[..., 0] = 10.0  # background wins big everywhere...
    logits[0, 4:12, 4:12, 0] = 0.0
    logits[0, 4:12, 4:12, 2] = 10.0  # ...fg wins big inside
    band = np.asarray(confidence.boundary_band(jnp.asarray(mask)))[0]
    # squeeze the decision on the rim: runner-up almost ties
    logits[0, band, 1] = 9.5
    conf = float(confidence.boundary_margin(
        jnp.asarray(logits), jnp.asarray(mask))[0])
    assert conf == pytest.approx(0.5, abs=1e-5)


def test_boundary_margin_empty_mask_uses_global_mean():
    # no predicted foreground: confident-empty slices must NOT look like
    # low-confidence slices (they would all route to the fallback)
    mask = np.zeros((2, 8, 8), np.uint8)
    logits = np.zeros((2, 8, 8, 3), np.float32)
    logits[..., 0] = 4.0
    conf = np.asarray(confidence.boundary_margin(
        jnp.asarray(logits), jnp.asarray(mask)))
    np.testing.assert_allclose(conf, [4.0, 4.0], rtol=1e-6)


# -- engine routing --------------------------------------------------------

@pytest.fixture()
def cascade_engine(tmp_path):
    cache = tmp_path / "engine" / "student.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    fb = tmp_path / "engine" / "fallback.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    assert engine.initialize_engine(str(cache), cascade_ckpt=str(fb))
    yield engine.get_engine(), str(fb)
    engine.cleanup_resources()


def _batch(n=5, size=64, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, size, size)).astype(np.uint8)


def test_threshold_none_matches_plain_infer(cascade_engine):
    eng, _ = cascade_engine
    eng.cascade_threshold = -np.inf  # nothing routes
    u8 = _batch()
    masks, conf, n_routed = eng.infer_cascade(u8)
    assert n_routed == 0
    np.testing.assert_array_equal(masks, np.asarray(eng.infer(u8.copy())))
    assert conf.shape == (5,) and np.isfinite(conf).all()


def test_threshold_all_matches_fallback_model(cascade_engine):
    eng, fb_path = cascade_engine
    eng.cascade_threshold = np.inf  # everything routes
    u8 = _batch()
    masks, _conf, n_routed = eng.infer_cascade(u8)
    assert n_routed == 5
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    np.testing.assert_array_equal(masks, np.asarray(fb_eng.infer(u8.copy())))


def test_partial_routing_splices_correctly(cascade_engine):
    eng, fb_path = cascade_engine
    u8 = _batch(n=7)
    # route exactly the below-median-confidence slices
    _, conf, _ = eng.infer_cascade(u8)  # first call just to read conf
    eng.cascade_threshold = float(np.median(conf))
    masks, conf2, n_routed = eng.infer_cascade(u8.copy())
    np.testing.assert_allclose(conf2, conf, rtol=1e-6)
    routed = np.nonzero(conf < eng.cascade_threshold)[0]
    assert n_routed == routed.size and 0 < n_routed < 7
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    fb_masks = np.asarray(fb_eng.infer(u8.copy()))
    student_masks = np.asarray(eng.infer(u8.copy()))
    for i in range(7):
        expect = fb_masks[i] if i in routed else student_masks[i]
        np.testing.assert_array_equal(masks[i], expect)


def test_process_batch_uses_cascade(cascade_engine, tmp_path):
    from unetseg_tpu.io import raw as raw_io

    eng, _ = cascade_engine
    eng.cascade_threshold = np.inf
    rng = np.random.default_rng(0)
    paths, dirs = [], []
    for i in range(3):
        p = tmp_path / f"s{i}.raw"
        raw_io.write_raw(str(p), rng.integers(
            0, 65536, size=(64, 64), dtype=np.uint16))
        paths.append(str(p))
        dirs.append(str(tmp_path / "out"))
    ok, fail = engine.process_batch(paths, 64, 64, dirs, batch_size=4)
    assert (ok, fail) == (3, 0)
    assert (tmp_path / "out" / "s0_mask.png").exists()


def test_cli_init_cascade_flag(tmp_path, capsys):
    import io

    from unetseg_tpu import cli

    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    stdin = io.StringIO(f"init {cache} --cascade {fb} 2.0\nexit\n")
    assert cli.repl(stdin) == 0
    out = capsys.readouterr().out
    assert "Engine initialized successfully" in out


# -- disagreement router -----------------------------------------------------

@pytest.fixture()
def disagree_engine(tmp_path):
    cache = tmp_path / "e" / "student.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    co = tmp_path / "e" / "co.ckpt"
    checkpoint.create(str(co), SMALL, seed=7)  # same geometry, other weights
    fb = tmp_path / "e" / "fallback.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    assert engine.initialize_engine(
        str(cache), cascade_ckpt=str(fb), cascade_router="disagree",
        cascade_co_ckpt=str(co), cascade_threshold=0.0)
    yield engine.get_engine(), str(fb), str(co)
    engine.cleanup_resources()


def test_disagree_self_co_routes_nothing(tmp_path):
    """co == student -> zero disagreement everywhere -> no routing."""
    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    assert engine.initialize_engine(
        str(cache), cascade_ckpt=str(fb), cascade_router="disagree",
        cascade_co_ckpt=str(cache), cascade_threshold=0.0)
    try:
        eng = engine.get_engine()
        u8 = _batch()
        masks, conf, n_routed = eng.infer_cascade(u8)
        assert n_routed == 0
        np.testing.assert_array_equal(conf, np.zeros(5, np.float32))
        np.testing.assert_array_equal(masks, np.asarray(eng.infer(u8.copy())))
    finally:
        engine.cleanup_resources()


def test_disagree_threshold_neg_routes_all(disagree_engine):
    eng, fb_path, _ = disagree_engine
    eng.cascade_threshold = -1.0  # disagreement >= 0 > -1 -> all route
    u8 = _batch()
    masks, conf, n_routed = eng.infer_cascade(u8)
    assert n_routed == 5
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    np.testing.assert_array_equal(masks, np.asarray(fb_eng.infer(u8.copy())))


def test_disagree_partial_routing(disagree_engine):
    eng, fb_path, co_path = disagree_engine
    u8 = _batch(n=7)
    _, conf, _ = eng.infer_cascade(u8)
    # disagreement statistic == host-computed mask mismatch counts
    co_params, co_cfg = checkpoint.load(co_path)
    co_eng = engine.InferenceEngine(co_params, co_cfg)
    ms = np.asarray(eng.infer(u8.copy()))
    mc = np.asarray(co_eng.infer(u8.copy()))
    expect_d = (ms != mc).reshape(7, -1).sum(axis=1)
    np.testing.assert_array_equal(conf.astype(np.int64), expect_d)
    # route above the median disagreement; splice correctness
    eng.cascade_threshold = float(np.median(conf))
    masks, _, n_routed = eng.infer_cascade(u8.copy())
    routed = np.nonzero(conf > eng.cascade_threshold)[0]
    assert n_routed == routed.size and 0 < n_routed < 7
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    fbm = np.asarray(fb_eng.infer(u8.copy()))
    for i in range(7):
        expect = fbm[i] if i in routed else ms[i]
        np.testing.assert_array_equal(masks[i], expect)


def test_disagree_requires_co():
    with pytest.raises(ValueError, match="co_params"):
        engine.InferenceEngine(
            *_tiny_params()).attach_cascade(
                *_tiny_params(), router="disagree")


# -- union ("both") router ---------------------------------------------------

@pytest.fixture()
def both_engine(tmp_path):
    cache = tmp_path / "e" / "student.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    co = tmp_path / "e" / "co.ckpt"
    checkpoint.create(str(co), SMALL, seed=7)
    fb = tmp_path / "e" / "fallback.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    assert engine.initialize_engine(
        str(cache), cascade_ckpt=str(fb), cascade_router="both",
        cascade_co_ckpt=str(co), cascade_threshold=np.inf,
        cascade_margin_threshold=-np.inf)
    yield engine.get_engine(), str(fb), str(co)
    engine.cleanup_resources()


def test_both_neither_trips_matches_plain_infer(both_engine):
    eng, _, _ = both_engine  # thresholds route nothing by fixture
    u8 = _batch()
    masks, conf, n_routed = eng.infer_cascade(u8)
    assert n_routed == 0
    np.testing.assert_array_equal(masks, np.asarray(eng.infer(u8.copy())))


def test_both_is_union_of_the_two_routers(both_engine):
    eng, fb_path, co_path = both_engine
    u8 = _batch(n=9)
    # read both statistics independently: disagreement from the both-router
    # conf return, margin from a margin-router pass on the same engine
    _, d_stat, _ = eng.infer_cascade(u8)
    eng.cascade_router = "margin"
    _, m_stat, _ = eng.infer_cascade(u8.copy())
    eng.cascade_router = "both"
    # set thresholds so each signal routes a DIFFERENT nonempty subset
    eng.cascade_threshold = float(np.sort(d_stat)[-2])      # top-1 by disagree
    eng.cascade_margin_threshold = float(np.sort(m_stat)[1])  # bottom-1 margin
    expect = np.nonzero((d_stat > eng.cascade_threshold)
                        | (m_stat < eng.cascade_margin_threshold))[0]
    masks, conf, n_routed = eng.infer_cascade(u8.copy())
    assert n_routed == expect.size >= 1
    np.testing.assert_allclose(conf, d_stat, rtol=1e-6)  # conf = disagreement
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    fbm = np.asarray(fb_eng.infer(u8.copy()))
    ms = np.asarray(eng.infer(u8.copy()))
    for i in range(9):
        np.testing.assert_array_equal(
            masks[i], fbm[i] if i in expect else ms[i])


def test_both_requires_co():
    with pytest.raises(ValueError, match="co_params"):
        engine.InferenceEngine(
            *_tiny_params()).attach_cascade(
                *_tiny_params(), router="both")


def test_cli_init_cascade_both(tmp_path, capsys):
    import io

    from unetseg_tpu import cli

    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    co = tmp_path / "co.ckpt"
    checkpoint.create(str(co), SMALL, seed=7)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    stdin = io.StringIO(
        f"init {cache} --cascade-both {co} {fb} 10\nexit\n")
    assert cli.repl(stdin) == 0
    assert "Engine initialized successfully" in capsys.readouterr().out


def _tiny_params():
    import jax

    from unetseg_tpu.models import unet

    return (jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), SMALL),
            SMALL)


def test_cli_init_cascade_disagree(tmp_path, capsys):
    import io

    from unetseg_tpu import cli

    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    co = tmp_path / "co.ckpt"
    checkpoint.create(str(co), SMALL, seed=7)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    stdin = io.StringIO(
        f"init {cache} --cascade-disagree {co} {fb} 10\nexit\n")
    assert cli.repl(stdin) == 0
    out = capsys.readouterr().out
    assert "Engine initialized successfully" in out
    eng_was = engine.get_engine()
    assert eng_was is None  # exit cleaned up


def test_process_single_image_uses_cascade(cascade_engine, tmp_path):
    from unetseg_tpu.io import raw as raw_io

    eng, fb_path = cascade_engine
    eng.cascade_threshold = np.inf  # force routing
    rng = np.random.default_rng(0)
    p = tmp_path / "one.raw"
    raw_io.write_raw(str(p), rng.integers(0, 65536, (64, 64), np.uint16))
    assert engine.process_single_image(str(p), 64, 64, str(tmp_path / "o"))
    import cv2

    vis = cv2.imread(str(tmp_path / "o" / "one_mask.png"),
                     cv2.IMREAD_GRAYSCALE)
    # mask must be the FALLBACK model's, fed through the usual cleanup+LUT
    fb_params, fb_cfg = checkpoint.load(fb_path)
    fb_eng = engine.InferenceEngine(fb_params, fb_cfg)
    from unetseg_tpu.io import native
    from unetseg_tpu.ops import decode

    u8 = native.preprocess_u8(
        np.asarray(raw_io.read_raw(str(p), 64, 64)), 64)
    expect = np.asarray(decode.mask_to_image(
        native.postprocess_batch(np.asarray(fb_eng.infer(u8[None])))[0]))
    np.testing.assert_array_equal(vis, expect)


# -- round-4 review fixes ----------------------------------------------------

def test_init_precompiles_cascade_programs(tmp_path):
    """With a cascade attached, the hot path is the fused router program —
    initialize_engine must warm it (plus the route bucket) so the first
    process request pays no lazy compile (the reference's warm-up contract,
    src/process.cpp:92-105)."""
    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    try:
        assert engine.initialize_engine(str(cache), cascade_ckpt=str(fb))
        eng = engine.get_engine()
        assert ("conf", 1) in eng._compiled       # fused student+router
        assert ("cascade", 1) in eng._compiled    # fallback route bucket
    finally:
        engine.cleanup_resources()


def test_partitioned_engines_propagate_cascade(tmp_path):
    """make_partitioned_engines must copy the cascade attachment: a
    partitioned service otherwise silently serves the uncascaded masks the
    operator configured the cascade to avoid."""
    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    co = tmp_path / "co.ckpt"
    checkpoint.create(str(co), SMALL, seed=7)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    try:
        assert engine.initialize_engine(
            str(cache), cascade_ckpt=str(fb), cascade_router="both",
            cascade_co_ckpt=str(co), cascade_threshold=0.0,
            cascade_margin_threshold=1.5)
        parts = engine.make_partitioned_engines(2)
        assert len(parts) == 2
        for p in parts:
            assert getattr(p, "_cascade_params", None) is not None
            assert getattr(p, "_cascade_co_params", None) is not None
            assert p.cascade_router == "both"
            assert p.cascade_threshold == 0.0
            assert p.cascade_margin_threshold == 1.5
        # the partition engine actually routes (threshold 0 px: everything)
        u8 = _batch(n=2)
        masks, _conf, n_routed = parts[0].infer_cascade(u8)
        assert masks.shape == (2, 64, 64) and n_routed == 2
    finally:
        engine.cleanup_resources()


def test_cli_cascade_both_margin_threshold_arg(monkeypatch):
    """--cascade-both <co> <fb> [max_px] [margin_thr]: the union's margin
    leg is tunable from the CLI (round-4 review fix)."""
    import io

    from unetseg_tpu import cli

    calls = {}

    def fake_init(cache, **kw):
        calls.update(kw)
        return False  # stop before touching real checkpoints

    monkeypatch.setattr(cli.engine, "initialize_engine", fake_init)
    cli.repl(io.StringIO("init m.ckpt --cascade-both co fb 32 0.7\nexit\n"))
    assert calls["cascade_router"] == "both"
    assert calls["cascade_threshold"] == 32.0
    assert calls["cascade_margin_threshold"] == 0.7


def test_failed_cascade_reinit_leaves_no_half_engine(tmp_path):
    """A re-init whose cascade checkpoint is missing must not leave a live
    cascade-less engine serving (round-4 review: the global was published
    before cascade validation)."""
    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    fb = tmp_path / "fb.ckpt"
    checkpoint.create(str(fb), BIG, seed=1)
    try:
        assert engine.initialize_engine(str(cache), cascade_ckpt=str(fb))
        assert engine.get_engine() is not None
        # re-init with a MISSING cascade -> False, and nothing servable
        assert not engine.initialize_engine(
            str(cache), cascade_ckpt=str(tmp_path / "nope.ckpt"))
        assert engine.get_engine() is None
        rng = np.random.default_rng(0)
        from unetseg_tpu.io import raw as raw_io

        p = tmp_path / "x.raw"
        raw_io.write_raw(str(p), rng.integers(0, 65536, (64, 64), np.uint16))
        assert not engine.process_single_image(str(p), 64, 64,
                                               str(tmp_path / "o"))
    finally:
        engine.cleanup_resources()
