"""The full loop: train on synthetic shapes -> checkpoint -> engine ->
polygon JSON.  Proves the framework end-to-end, not just stage-by-stage.
"""

import json

import numpy as np

import jax

from unetseg_tpu import checkpoint, engine, train
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.data import synth_slice, training_batch
from unetseg_tpu.io import raw as raw_io

CFG = ModelConfig(base_channels=8, depth=2, image_size=64,
                  compute_dtype="float32")


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return 1.0 if union == 0 else inter / union


def test_train_then_serve(tmp_path):
    rng = np.random.default_rng(0)

    tx = train.make_optimizer(lr=1e-2, total_steps=150)
    state = train.init_state(jax.random.key(0), CFG, tx)
    step = jax.jit(
        lambda s, b: train.train_step(s, b, CFG, tx), donate_argnums=(0,)
    )

    losses = []
    for i in range(150):
        imgs, labels = training_batch(rng, 8, size=64)
        state, loss = step(state, (imgs, labels))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, losses[::25]

    # held-out IoU of the raw network (pre-cleanup)
    imgs, labels = training_batch(rng, 8, size=64)
    from unetseg_tpu.models import unet
    from unetseg_tpu.ops import decode

    logits = unet.apply(state.params, imgs, CFG)
    pred = np.asarray(decode.decode_mask(logits, 3))
    iou = _iou(pred == 2, labels == 2)
    assert iou > 0.75, iou  # synthetic task is easy; 150 steps suffice

    # serve through the full engine
    cache = tmp_path / "eng" / "trained.ckpt"
    cache.parent.mkdir()
    checkpoint.save(str(cache), state.params, CFG)
    assert engine.initialize_engine(str(cache))
    try:
        raw, lab = synth_slice(rng, 64)
        raw_io.write_raw(str(tmp_path / "case.raw"), raw)
        out = tmp_path / "out"
        assert engine.process_single_image(str(tmp_path / "case.raw"),
                                           64, 64, str(out))
        # the organ is large (>6% area): a polygon JSON must exist
        cj = out / "case.json"
        assert cj.exists()
        obj = json.loads(cj.read_text())
        assert obj["shapes"], "trained model produced no contour"
        pts = np.asarray(obj["shapes"][0]["points"])
        # polygon centroid should sit inside the organ's bbox
        ys, xs = np.nonzero(lab == 2)
        cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
        assert xs.min() - 8 <= cx <= xs.max() + 8
        assert ys.min() - 8 <= cy <= ys.max() + 8
    finally:
        engine.cleanup_resources()


def test_distill_slim_then_serve(tmp_path):
    """The slim-flagship production recipe in miniature: train a teacher,
    distill a stem=2 student against it (train.distill_step), check mask
    agreement, serve the student checkpoint through the engine."""
    import jax.numpy as jnp

    from unetseg_tpu.models import registry as model_registry
    from unetseg_tpu.ops import decode

    rng = np.random.default_rng(1)

    # quick teacher
    tx = train.make_optimizer(lr=1e-2, total_steps=120)
    t_state = train.init_state(jax.random.key(0), CFG, tx)
    t_step = jax.jit(
        lambda s, b: train.train_step(s, b, CFG, tx), donate_argnums=(0,)
    )
    for _ in range(120):
        imgs, labels = training_batch(rng, 8, size=64)
        t_state, _ = t_step(t_state, (imgs, labels))

    # distilled stem=2 student
    s_cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                        compute_dtype="float32", stem=2)
    s_tx = train.make_optimizer(lr=1e-2, total_steps=150)
    s_state = train.init_state(jax.random.key(1), s_cfg, s_tx)
    s_step = jax.jit(
        lambda s, b: train.distill_step(s, b, s_cfg, s_tx),
        donate_argnums=(0,),
    )
    teacher_fwd = jax.jit(lambda p, x: model_registry.apply(p, x, CFG))
    for _ in range(150):
        imgs, labels = training_batch(rng, 8, size=64)
        t_logits = teacher_fwd(t_state.params, imgs)
        s_state, loss = s_step(s_state, (jnp.asarray(imgs),
                                         jnp.asarray(labels), t_logits))
    assert np.isfinite(float(loss))

    # student/teacher mask agreement on held-out slices
    imgs, _ = training_batch(rng, 8, size=64)
    t_pred = np.asarray(decode.decode_mask(
        teacher_fwd(t_state.params, imgs), 3))
    s_pred = np.asarray(decode.decode_mask(
        model_registry.apply(s_state.params, imgs, s_cfg), 3))
    agree = _iou(s_pred == 2, t_pred == 2)
    assert agree > 0.9, agree  # tiny nets + 150 steps: loose gate

    # serve the student checkpoint through the full engine
    cache = tmp_path / "eng" / "slim.ckpt"
    cache.parent.mkdir(parents=True)
    checkpoint.save(str(cache), s_state.params, s_cfg)
    assert engine.initialize_engine(str(cache))
    try:
        raw, _ = synth_slice(rng, 64)
        raw_io.write_raw(str(tmp_path / "slim_case.raw"), raw)
        out = tmp_path / "out_slim"
        assert engine.process_single_image(str(tmp_path / "slim_case.raw"),
                                           64, 64, str(out))
        assert (out / "slim_case_mask.png").exists()
    finally:
        engine.cleanup_resources()
