"""Model checkpoint = the reference's serialized-engine analog.

The reference's "checkpoint" is an opaque TensorRT plan file deserialized at
init (``/root/reference/src/initialize.cpp:48-60``); its provenance chain is
PyTorch .pt -> ONNX -> .trt (``.gitignore:2-7``).  Ours is a single-file
msgpack bundle: model config + float32 parameter pytree.  The XLA analog of
the plan file's *compiled* nature is the JAX persistent compilation cache,
configured at initialize() time (engine.py), so re-inits skip compilation the
same way deserializing a plan skips the TRT build.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
from flax import serialization

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry

MAGIC = b"UTPUCKPT1\n"


def save(path: str, params, cfg: ModelConfig) -> None:
    """Serialize config + params to a single plan-file-like artifact."""
    params = jax.device_get(params)
    header = dict(dataclasses.asdict(cfg))
    payload = serialization.msgpack_serialize({"config": header, "params": params})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(payload)
    os.replace(tmp, path)


def load(path: str) -> Tuple[dict, ModelConfig]:
    """Deserialize a checkpoint; returns (params, model_config).

    Version guard: files written by a newer/older format revision (magic
    ``UTPUCKPT<n>``) fail with an actionable message instead of a decode
    error deep inside msgpack.
    """
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            if magic.startswith(b"UTPUCKPT"):
                raise ValueError(
                    f"Checkpoint format version mismatch: {path} has "
                    f"{magic.strip().decode(errors='replace')!r}, this build "
                    f"reads {MAGIC.strip().decode()!r} — re-export the "
                    f"checkpoint with a matching framework version"
                )
            raise ValueError(f"Not a unetseg_tpu checkpoint: {path}")
        blob = f.read()
    data = serialization.msgpack_restore(blob)
    cfg = config_from_snapshot(data["config"], path)
    return data["params"], cfg


def config_from_snapshot(raw_cfg, source: str) -> ModelConfig:
    """ModelConfig from a serialized config dict, tolerating newer fields.

    Same-magic forward compatibility: config fields are added without a
    MAGIC bump (stem/arch/deep_supervision all were), so a snapshot from a
    build with an extra field must not die in a raw TypeError — drop
    unknown keys with a warning instead (round-4 review finding).  Shared
    by :func:`load` and ``train.load_state`` so the two loaders cannot
    diverge again.
    """
    import dataclasses

    known = {f.name for f in dataclasses.fields(ModelConfig)}
    raw_cfg = dict(raw_cfg)
    extra = sorted(set(raw_cfg) - known)
    if extra:
        import warnings

        warnings.warn(
            f"checkpoint {source} carries unknown config fields {extra} "
            f"(written by a newer build?) — ignoring them", stacklevel=2)
    return ModelConfig(**{k: v for k, v in raw_cfg.items() if k in known})


def load_serving(models_dir: str, include_flagship: bool = True):
    """Best serving checkpoint by the shipped policy, or None.

    Priority: slim5 (if shipped) > slim4 specialist > slim4 robust >
    gen-1 slim > (optionally) the flagship teacher.  Returns
    (params, cfg, tier_name).  This is THE single copy of the policy —
    bench.py, benchmarks/run_all.py and __graft_entry__.py each
    hand-rolled divergent variants (round-4 review finding: run_all
    silently dropped to random-init where bench served the flagship)."""
    import os

    order = [("slim5", "flagship_slim5.ckpt"),
             ("slim4", "flagship_slim4.ckpt"),
             ("slim4", "flagship_slim4_robust.ckpt"),
             ("slim", "flagship_slim.ckpt")]
    if include_flagship:
        order.append(("flagship", "flagship_synth.ckpt"))
    for name, fname in order:
        p = os.path.join(models_dir, fname)
        if os.path.exists(p):
            params, cfg = load(p)
            return params, cfg, name
    return None


def create(path: str, cfg: ModelConfig = ModelConfig(), seed: int = 0) -> None:
    """Create a fresh randomly-initialized checkpoint (for tests/demo/train)."""
    init = jax.jit(model_registry.get(cfg.arch)[0], static_argnums=(1,))
    params = init(jax.random.key(seed), cfg)
    save(path, params, cfg)


def params_from_torch_state_dict(state_dict, cfg: ModelConfig = ModelConfig()):
    """Import weights from the canonical PyTorch UNet layout.

    The reference's training pipeline lives outside its repo; its artifact
    chain starts from a torch checkpoint (``.gitignore:2``).  This importer
    accepts a state_dict from the standard UNet layout (milesial-style naming:
    ``inc``, ``down{i}``, ``up{i}``, ``outc`` or plain ``encoder.{i}...``) and
    converts OIHW conv weights to our HWIO/NHWC pytree.  See
    models/import_torch.py for the full mapping logic.
    """
    from unetseg_tpu.models.import_torch import convert_state_dict

    return convert_state_dict(state_dict, cfg)
