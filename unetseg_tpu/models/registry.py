"""Model-family registry.

The reference hard-codes one opaque engine; the framework dispatches on
``ModelConfig.arch`` so checkpoints are self-describing and every pipeline
(engine, batch/tiles/TTA, training) works with any registered family.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

from unetseg_tpu.config import ModelConfig

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str, init_fn: Callable, apply_fn: Callable) -> None:
    _REGISTRY[name] = (init_fn, apply_fn)


def _ensure_builtin() -> None:
    if "unet" not in _REGISTRY:
        from unetseg_tpu.models import unet

        register("unet", unet.init, unet.apply)
    if "unetpp" not in _REGISTRY:
        from unetseg_tpu.models import unetpp

        register("unetpp", unetpp.init, unetpp.apply)
    if "attention_unet" not in _REGISTRY:
        from unetseg_tpu.models import attention_unet

        register("attention_unet", attention_unet.init, attention_unet.apply)
    if "unet_w8a8" not in _REGISTRY:
        try:
            # importing the module registers the quantized-serving arch;
            # the OPTIONAL w8a8 path must not break unet/unetpp lookups
            # if its import ever fails (round-4 review finding)
            from unetseg_tpu import quantize  # noqa: F401
        except Exception:  # pragma: no cover
            pass


def get(name: str) -> Tuple[Callable, Callable]:
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model arch '{name}'; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def init(rng: jax.Array, cfg: ModelConfig):
    return get(cfg.arch)[0](rng, cfg)


def apply(params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    return get(cfg.arch)[1](params, x, cfg)
