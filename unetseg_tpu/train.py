"""Training step for the UNet — the missing upstream of the reference.

The reference ships only the inference artifact; its training pipeline
(PyTorch -> ONNX -> TRT, ``.gitignore:2-7``) lives outside the repo.  We make
it first-class and TPU-native:

* loss = softmax cross-entropy + soft Dice (the standard medical-seg combo),
* optax AdamW with cosine schedule,
* one jitted, fully sharded train step over a (dp, sp) mesh: batch over
  ``dp``, image rows over ``sp`` (XLA SPMD spatially partitions the convs and
  inserts halo exchanges over ICI); gradients all-reduce over both axes
  automatically because params are replicated,
* `jax.checkpoint` (rematerialization) on each encoder/decoder stage trades
  FLOPs for HBM so 512² activations at depth-4/64ch fit comfortably.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-4,
                   total_steps: int = 10_000) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=max(1, total_steps // 20),
        decay_steps=total_steps,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def soft_dice_loss(logits: jax.Array, labels: jax.Array,
                   num_classes: int, eps: float = 1e-6) -> jax.Array:
    """Mean soft Dice over classes; logits (N,H,W,C), labels (N,H,W) int."""
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    inter = jnp.sum(probs * onehot, axis=(1, 2))
    denom = jnp.sum(probs + onehot, axis=(1, 2))
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def boundary_weight_map(labels: jax.Array, radius: int = 2,
                        boost: float = 8.0) -> jax.Array:
    """Per-pixel loss weights emphasizing label-transition bands.

    A pixel is "boundary" when its (2r+1)² neighborhood spans more than one
    class (max-pool != min-pool over the label map — two reduce_windows,
    fully fused by XLA).  Worst-slice IoU is dominated by rim errors on
    small structures (a 0.2% IoU loss on a 0.12·S-radius organ is ~0.06 px
    of average edge error), so the round-4 accuracy-tail work (VERDICT r3
    item 1) weights exactly those pixels.
    """
    lab = labels.astype(jnp.int32)
    k = 2 * radius + 1
    mx = jax.lax.reduce_window(
        lab, jnp.iinfo(jnp.int32).min, jax.lax.max, (1, k, k), (1, 1, 1),
        "SAME")
    mn = jax.lax.reduce_window(
        lab, jnp.iinfo(jnp.int32).max, jax.lax.min, (1, k, k), (1, 1, 1),
        "SAME")
    return 1.0 + boost * (mx != mn).astype(jnp.float32)


def _weighted_mean(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    if w is None:
        return jnp.mean(x)
    return jnp.sum(x * w) / jnp.sum(w)


def segmentation_loss(params, batch: Tuple[jax.Array, jax.Array],
                      cfg: ModelConfig, *,
                      boundary_boost: float = 0.0) -> jax.Array:
    imgs, labels = batch
    logits = model_registry.apply(params, imgs, cfg)
    w = (boundary_weight_map(labels, boost=boundary_boost)
         if boundary_boost > 0 else None)
    ce = _weighted_mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels), w
    )
    dice = soft_dice_loss(logits, labels, cfg.num_classes)
    return ce + dice


def _apply_grads(state: TrainState, tx: optax.GradientTransformation,
                 loss: jax.Array, grads) -> Tuple[TrainState, jax.Array]:
    """The shared grad->update->apply sequence of train_step/distill_step —
    one place, so update-semantics changes cannot diverge the two paths."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def train_step(state: TrainState, batch, cfg: ModelConfig,
               tx: optax.GradientTransformation, *,
               boundary_boost: float = 0.0
               ) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(segmentation_loss)(
        state.params, batch, cfg, boundary_boost=boundary_boost
    )
    return _apply_grads(state, tx, loss, grads)


# ---------------------------------------------------------------------------
# Knowledge distillation (the slim-flagship trainer, docs/PERFORMANCE.md r3)
# ---------------------------------------------------------------------------

def distillation_loss(params, batch: Tuple[jax.Array, jax.Array, jax.Array],
                      cfg: ModelConfig, *, alpha: float = 0.5,
                      temperature: float = 2.0,
                      boundary_boost: float = 0.0) -> jax.Array:
    """Hard-label seg loss blended with KL to a teacher's logits.

    ``batch`` = (imgs, labels, teacher_logits).  The KL term (temperature-
    scaled, Hinton-style) pulls the student's decision boundary onto the
    teacher's — the mechanism behind the >=0.999 mask-agreement contract of
    the slim serving checkpoint (VERDICT r2 item 2).  ``boundary_boost``
    up-weights label-transition pixels in both the CE and KL terms
    (boundary_weight_map) — the worst-slice lever of VERDICT r3 item 1.
    """
    imgs, labels, t_logits = batch
    logits = model_registry.apply(params, imgs, cfg)
    w = (boundary_weight_map(labels, boost=boundary_boost)
         if boundary_boost > 0 else None)
    ce = _weighted_mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels), w
    )
    dice = soft_dice_loss(logits, labels, cfg.num_classes)
    t = temperature
    t_prob = jax.nn.softmax(t_logits / t, axis=-1)
    s_logp = jax.nn.log_softmax(logits / t, axis=-1)
    kl = _weighted_mean(
        jnp.sum(t_prob * (jnp.log(t_prob + 1e-9) - s_logp), axis=-1), w)
    return (1.0 - alpha) * (ce + dice) + alpha * (t * t) * kl


def distill_step(state: TrainState, batch, cfg: ModelConfig,
                 tx: optax.GradientTransformation, *, alpha: float = 0.5,
                 temperature: float = 2.0,
                 boundary_boost: float = 0.0) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(distillation_loss)(
        state.params, batch, cfg, alpha=alpha, temperature=temperature,
        boundary_boost=boundary_boost
    )
    return _apply_grads(state, tx, loss, grads)


def init_state(rng: jax.Array, cfg: ModelConfig,
               tx: optax.GradientTransformation) -> TrainState:
    params = model_registry.init(rng, cfg)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_sharded_train_step(cfg: ModelConfig, mesh: Mesh,
                            tx: optax.GradientTransformation, *,
                            boundary_boost: float = 0.0,
                            distill: bool = False,
                            alpha: float = 0.5,
                            temperature: float = 2.0):
    """Jit the train step with real multi-chip shardings over (dp, sp).

    Inputs: imgs (N, H, W, C) sharded P('dp','sp'); labels (N, H, W) sharded
    P('dp','sp'); state replicated.  XLA inserts the grad all-reduce and the
    conv halo exchanges.

    ``boundary_boost`` and ``distill=True`` (batch then also carries
    teacher_logits, sharded like imgs) plumb the shipped checkpoint's actual
    recipe through the sharded path — previously only the plain un-boosted
    step was reachable here, so multi-chip boundary-weighted/distillation
    runs had to hand-roll their jit (round-4 review finding).
    """
    repl = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("dp", "sp"))

    if distill:
        step = functools.partial(distill_step, cfg=cfg, tx=tx, alpha=alpha,
                                 temperature=temperature,
                                 boundary_boost=boundary_boost)
        batch_s = (img_s, img_s, img_s)
    else:
        step = functools.partial(train_step, cfg=cfg, tx=tx,
                                 boundary_boost=boundary_boost)
        batch_s = (img_s, img_s)
    return jax.jit(
        step,
        in_shardings=(repl, batch_s),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# ---------------------------------------------------------------------------
# Train-state checkpoint / resume (the aux subsystem the reference lacks,
# SURVEY §5 checkpoint/resume)
# ---------------------------------------------------------------------------

def save_state(path: str, state: TrainState, cfg: ModelConfig) -> None:
    """Serialize the full training state (params + optimizer + step)."""
    import dataclasses
    import os

    import jax as _jax
    from flax import serialization

    payload = serialization.msgpack_serialize({
        "config": dict(dataclasses.asdict(cfg)),
        "params": _jax.device_get(state.params),
        "opt_state": _jax.device_get(
            serialization.to_state_dict(state.opt_state)
        ),
        "step": int(state.step),
    })
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"UTPUTRAIN1\n")
        f.write(payload)
    os.replace(tmp, path)


def load_state(path: str, tx: optax.GradientTransformation
               ) -> Tuple[TrainState, ModelConfig]:
    """Restore a training state saved by :func:`save_state`."""
    from flax import serialization

    with open(path, "rb") as f:
        magic = f.read(11)
        if magic != b"UTPUTRAIN1\n":
            raise ValueError(f"Not a unetseg_tpu train checkpoint: {path}")
        data = serialization.msgpack_restore(f.read())
    from unetseg_tpu.checkpoint import config_from_snapshot

    cfg = config_from_snapshot(data["config"], path)
    params = data["params"]
    # Rebuild the optimizer pytree structure, then refill from the snapshot.
    opt_state = tx.init(params)
    opt_state = serialization.from_state_dict(opt_state, data["opt_state"])
    state = TrainState(params, opt_state, jnp.asarray(data["step"], jnp.int32))
    return state, cfg
