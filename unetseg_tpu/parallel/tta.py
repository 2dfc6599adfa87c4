"""Test-time-augmentation ensemble (BASELINE config 5).

The 8 dihedral transforms (4 rotations x optional horizontal flip) of the
input run as one batch of 8 — sharded 1:1 across a v5e-8 mesh — and the
inverse-transformed logits are averaged before the argmax decode.  The mean
reduction is the only cross-device collective (an all-reduce over ``dp``
inserted by XLA), riding ICI.

The reference has no TTA; this is net-new TPU capability (SURVEY §2
parallelism table, row DP/TTA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry
from unetseg_tpu.ops import decode, postprocess

N_TRANSFORMS = 8


def dihedral(img: jax.Array, k: int) -> jax.Array:
    """k in [0,8): rot90 by (k % 4), horizontal flip if k >= 4.

    Operates on the leading two (H, W) axes.
    """
    out = jnp.rot90(img, k % 4, axes=(0, 1))
    if k >= 4:
        out = jnp.flip(out, axis=1)
    return out


def dihedral_inverse(img: jax.Array, k: int) -> jax.Array:
    if k >= 4:
        img = jnp.flip(img, axis=1)
    return jnp.rot90(img, -(k % 4), axes=(0, 1))


def tta_logits(params, img_f32: jax.Array, cfg: ModelConfig) -> jax.Array:
    """(H, W) float in [0,1] -> (H, W, C) ensemble-mean logits."""
    batch = jnp.stack([dihedral(img_f32, k) for k in range(N_TRANSFORMS)])
    logits = model_registry.apply(params, batch[..., None], cfg)
    undone = jnp.stack(
        [dihedral_inverse(logits[k], k) for k in range(N_TRANSFORMS)]
    )
    return jnp.mean(undone, axis=0)


def make_tta_batch_pipeline(cfg: ModelConfig, mesh=None,
                            device_postprocess=False):
    """jitted (params, u8 (N,H,W)) -> masks (N,H,W): 8-fold TTA over a
    BATCH of slices as ONE program (N*8 model rows), amortizing the
    per-dispatch round trip the per-slice ensemble pays — the same lever
    as the serving batch (RESULTS_r3.md batch-scaling table).  With a
    mesh, the flat N*8 batch shards over ``dp``."""

    def pipeline(params, u8b):
        x = u8b.astype(jnp.float32) / 255.0              # (N, H, W)
        views = jnp.stack(
            [jax.vmap(lambda im, kk=k: dihedral(im, kk))(x)
             for k in range(N_TRANSFORMS)], axis=1)       # (N, 8, H, W)
        n, t, h, w = views.shape
        flat = views.reshape(n * t, h, w)[..., None]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            flat = jax.lax.with_sharding_constraint(
                flat, NamedSharding(mesh, P("dp")))
        logits = model_registry.apply(params, flat, cfg)
        logits = logits.reshape(n, t, h, w, -1)
        undone = jnp.stack(
            [jax.vmap(lambda lg, kk=k: dihedral_inverse(lg, kk))(
                logits[:, k]) for k in range(N_TRANSFORMS)], axis=1)
        mask = decode.decode_mask(jnp.mean(undone, axis=1),
                                  cfg.num_classes)
        if device_postprocess:
            import functools

            from unetseg_tpu.parallel.batch import _device_cc

            mask = jax.vmap(functools.partial(
                postprocess.postprocess_mask,
                use_pallas_cc=_device_cc()))(mask)
        return mask

    return jax.jit(pipeline)


def make_tta_pipeline(cfg: ModelConfig, mesh=None, device_postprocess=True):
    """jitted (params, u8 (H,W)) -> mask with 8-fold TTA ensemble.

    ``device_postprocess=False`` stops at the argmax decode (the engine then
    runs the C++ host cleanup, its production split).
    """

    def pipeline(params, u8):
        x = u8.astype(jnp.float32) / 255.0
        batch = jnp.stack([dihedral(x, k) for k in range(N_TRANSFORMS)])[..., None]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P("dp"))
            )
        logits = model_registry.apply(params, batch, cfg)
        undone = jnp.stack(
            [dihedral_inverse(logits[k], k) for k in range(N_TRANSFORMS)]
        )
        mean_logits = jnp.mean(undone, axis=0)
        mask = decode.decode_mask(mean_logits, cfg.num_classes)
        if device_postprocess:
            from unetseg_tpu.parallel.batch import _device_cc

            mask = postprocess.postprocess_mask(
                mask, use_pallas_cc=_device_cc())
        return mask

    return jax.jit(pipeline)
