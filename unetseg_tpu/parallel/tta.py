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

import functools

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


def _kernel_dihedral_inv(w, k: int):
    """Inverse dihedral on a HWIO kernel's spatial dims (the exact conv /
    conv_transpose equivariance partner of :func:`dihedral` on NHWC
    activations — derived and verified in tests/test_parallel.py)."""
    if k >= 4:
        w = jnp.flip(w, axis=1)
    return jnp.rot90(w, -(k % 4), axes=(0, 1))


def _np_dihedral(a, k):
    """Pure-numpy dihedral on (H, W, C) — perm derivation must stay out of
    any active jit trace (jnp ops would become tracers)."""
    import numpy as np

    out = np.rot90(a, k % 4, axes=(0, 1))
    if k >= 4:
        out = np.flip(out, axis=1)
    return out


def _np_dihedral_inv(a, k):
    import numpy as np

    if k >= 4:
        a = np.flip(a, axis=1)
    return np.rot90(a, -(k % 4), axes=(0, 1))


def _np_s2d(x, r):
    h, w, c = x.shape
    x = x.reshape(h // r, r, w // r, r, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(h // r, w // r, r * r * c)


def _np_d2s(x, r):
    h, w, c = x.shape
    x = x.reshape(h, w, r, r, c // (r * r))
    return x.transpose(0, 2, 1, 3, 4).reshape(h * r, w * r, c // (r * r))


@functools.lru_cache(maxsize=None)
def _s2d_perm(r: int, k: int):
    """perm with s2d(dihedral(x, k))[..., i] == dihedral(s2d(x, r), k)[..., perm[i]]."""
    import numpy as np

    h = 4 * r
    x = np.arange(h * h, dtype=np.float32).reshape(h, h, 1)
    a = _np_s2d(_np_dihedral(x, k), r)
    b = _np_dihedral(_np_s2d(x, r), k)
    perm = []
    for i in range(r * r):
        js = [j for j in range(r * r) if np.array_equal(a[..., i], b[..., j])]
        assert len(js) == 1
        perm.append(js[0])
    return tuple(perm)


@functools.lru_cache(maxsize=None)
def _d2s_perm(r: int, c: int, k: int):
    """perm with dihedral_inverse(d2s(dihedral-frame y)) == d2s(y[..., perm])."""
    import numpy as np

    rng = np.random.default_rng(12345)
    y = rng.standard_normal((4, 4, c * r * r)).astype(np.float32)
    perm = []
    for i in range(c * r * r):
        yi = np.zeros_like(y)
        yi[..., i] = y[..., i]
        ai = _np_dihedral_inv(_np_d2s(_np_dihedral(yi, k), r), k)
        js = []
        for j in range(c * r * r):
            yj = np.zeros_like(y)
            yj[..., j] = y[..., i]
            if np.allclose(_np_d2s(yj, r), ai):
                js.append(j)
        assert len(js) == 1, (r, c, k, i, js)
        perm.append(js[0])
    return tuple(perm)


def transform_params_dihedral(params, cfg: ModelConfig, k: int):
    """θ_k with ``apply(θ_k, x) == dihedral_inverse(apply(θ, dihedral(x)))``.

    Weight-space TTA: conv/pool/concat/s2d/d2s are dihedral-equivariant, so
    the 8-view ensemble becomes 8 runs of the SAME untransposed input
    through transformed weights — no activation rot90/flip traffic at all
    (the measured cost of the view-batched ensemble).  Kernels get the
    inverse dihedral on their spatial dims; a stem>1 model additionally
    permutes the first conv's input channels (s2d block positions move
    under rotation) and the head's output channels (d2s inverse).

    Covers every float family (``unet``, ``attention_unet``, ``unetpp``)
    via a generic pytree walk: any dict holding a rank-4 ``w`` is a conv
    site whose spatial dims get the inverse dihedral; everything those
    families compose between convs (ReLU/sigmoid/multiply pointwise ops,
    pool, concat, transposed conv, s2d/d2s, head means) is
    dihedral-equivariant, and 1x1 kernels are fixed points so gate/head
    sites transform as no-ops.  Equivalence against the activation-space
    ensemble is pinned per family in tests/test_parallel.py.  Quantized
    archs (``unet_w8a8``) stay on the activation-space ensemble — their
    per-channel scale tables are not spatial-transform-aware."""
    def tw(site):
        return {**site, "w": _kernel_dihedral_inv(site["w"], k)}

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                return tw(node)
            return {name: walk(v) for name, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    out = walk(params)
    if cfg.stem > 1:
        import numpy as np

        # gather with the INVERSE perms: the first conv must read the
        # channel that lands in each s2d slot under rotation, and the head
        # must emit into the slot d2s reads for each subpixel.
        perm_in = jnp.asarray(np.argsort(_s2d_perm(cfg.stem, k)))
        w0 = out["encoder"][0]["conv1"]["w"]
        out["encoder"][0]["conv1"] = {
            **out["encoder"][0]["conv1"], "w": w0[:, :, perm_in, :]}
        perm_out = jnp.asarray(np.argsort(
            _d2s_perm(cfg.stem, cfg.num_classes, k)))
        hw = out["head"]["w"]
        out["head"] = {"w": hw[..., perm_out],
                       "b": out["head"]["b"][perm_out]}
    return out


def make_tta_weightspace_pipeline(cfg: ModelConfig,
                                  device_postprocess=False):
    """jitted (params, u8 (N,H,W)) -> masks: the 8-fold ensemble via
    :func:`transform_params_dihedral` — 8 model passes over the SAME
    activations, zero view transposes."""

    def pipeline(params, u8b):
        x = (u8b.astype(jnp.float32) / 255.0)[..., None]
        acc = None
        for k in range(N_TRANSFORMS):
            logits = model_registry.apply(
                transform_params_dihedral(params, cfg, k), x, cfg)
            acc = logits if acc is None else acc + logits
        mask = decode.decode_mask(acc / N_TRANSFORMS, cfg.num_classes)
        if device_postprocess:
            from unetseg_tpu.parallel.batch import _device_cc

            # batched entry (NOT vmap of the single-mask fn: the v4
            # exact-fallback cond lives at batch level)
            mask = postprocess.postprocess_masks(
                mask, use_pallas_cc=_device_cc())
        return mask

    return jax.jit(pipeline)


def make_tta_weightspace_mesh_pipeline(cfg: ModelConfig, mesh,
                                       device_postprocess=False):
    """Weight-space TTA sharded over a device mesh (BASELINE config 5:
    "ensemble across a v5e-8 slice").

    The 8 transformed-weight variants stack on a leading axis that shards
    over ``dp`` — each chip runs the SAME untransposed activations through
    its own weight variant(s), and the only collective is the logit-mean
    all-reduce riding ICI.  Masks are bit-identical to the sequential
    weight-space ensemble (same logit sum, associativity-safe in f32 mean).
    Requires 8 % mesh.shape['dp'] == 0 (1, 2, 4 or 8 chips).

    Implementation: shard_map, not vmap — vmapping apply() over a stacked
    weight axis lowers convs to feature_group_count form, which XLA rejects
    when out_channels isn't divisible by the variant count (the subpixel
    head's num_classes·stem² rarely is).  Under shard_map each device runs
    its 8/dp local variants as plain sequential apply() calls (zero
    activation transposes, the weight-space win) and contributes to one
    logit-sum psum over ICI.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dp = mesh.shape["dp"]
    assert N_TRANSFORMS % n_dp == 0
    local = N_TRANSFORMS // n_dp

    def pipeline(params, u8b):
        x = (u8b.astype(jnp.float32) / 255.0)[..., None]
        variants = [transform_params_dihedral(params, cfg, k)
                    for k in range(N_TRANSFORMS)]
        thetas = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *variants)

        def body(thetas_local, x_rep):
            acc = None
            for i in range(local):
                th = jax.tree_util.tree_map(lambda l, i=i: l[i], thetas_local)
                lg = model_registry.apply(th, x_rep, cfg)
                acc = lg if acc is None else acc + lg
            return jax.lax.psum(acc, "dp")

        logits = shard_map(
            body, mesh=mesh,
            in_specs=(P("dp"), P()), out_specs=P(),
        )(thetas, x)
        mask = decode.decode_mask(logits / N_TRANSFORMS, cfg.num_classes)
        if device_postprocess:
            from unetseg_tpu.parallel.batch import _device_cc

            # batched entry (NOT vmap of the single-mask fn: the v4
            # exact-fallback cond lives at batch level)
            mask = postprocess.postprocess_masks(
                mask, use_pallas_cc=_device_cc())
        return mask

    return jax.jit(pipeline)


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
            from unetseg_tpu.parallel.batch import _device_cc

            mask = postprocess.postprocess_masks(
                mask, use_pallas_cc=_device_cc())
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
