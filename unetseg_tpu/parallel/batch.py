"""Sharded batch inference (BASELINE config 2: batch-32 512² slices).

The reference's only batching is a serial host loop
(``/root/reference/src/main.cpp:148-164``).  Here the slice batch is sharded
over the ``dp`` mesh axis: one jitted program, XLA partitions every conv and
the postprocess (which is purely per-image, so no cross-device traffic at
all), and each chip runs batch/n_dp slices.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry
from unetseg_tpu.ops import decode, postprocess, preprocess

def _device_cc() -> bool:
    """Pallas CCL (ops/cc_pallas) on real TPUs; XLA relaxation elsewhere
    (tests run the CPU backend where Mosaic kernels can't compile)."""
    import jax

    return jax.devices()[0].platform == "tpu"



def make_sharded_pipeline(cfg: ModelConfig, mesh: Mesh, spatial: bool = False):
    """Returns jitted fn (params, u8 (N,S,S)) -> {0,2} masks (N,S,S).

    ``spatial=True`` additionally shards image rows over the ``sp`` axis
    (XLA inserts conv halo exchanges over ICI).
    """
    in_spec = P("dp", "sp") if spatial else P("dp")

    def pipeline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None]
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*in_spec, None) if spatial else P("dp"))
        )
        logits = model_registry.apply(params, x, cfg)
        mask = decode.decode_mask(logits, cfg.num_classes)
        return postprocess.postprocess_masks(
            mask, use_pallas_cc=_device_cc())

    return jax.jit(
        pipeline,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, in_spec)),
        out_shardings=NamedSharding(mesh, P("dp")),
    )


def make_sharded_forward(cfg: ModelConfig, mesh: Mesh):
    """Sharded logits-only forward (for TTA/tiling composition)."""

    def fwd(params, x):
        return model_registry.apply(params, x, cfg)

    return jax.jit(
        fwd,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp")),
        ),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
