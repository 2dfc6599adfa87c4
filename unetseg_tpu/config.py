"""Typed configuration for the TPU segmentation framework.

The reference has no config system: every tunable is a compile-time constant
(``/root/reference/src/postprocess.cpp:5-9``: FOREGROUND_VALUE=2, kernel 3,
MIN_AREA_RATIO=0.06), a hard-coded literal (512x512 shape
``src/process.cpp:70``, tensor names "input"/"output" ``src/process.cpp:224``,
3-class argmax ``src/process.cpp:162``, JSON version ``src/mask2polygon.cpp:9``)
or a positional REPL argument.  This module collects those exact defaults in
one frozen dataclass so every stage shares a single source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """UNet architecture contract implied by the reference engine.

    Reference: input tensor "input" = 1x1x512x512 f32 (src/process.cpp:70,224),
    output "output" = 1xCx512x512 logits with C hard-coded to 3 in the argmax
    decode (src/process.cpp:162).  The .gitignore (.pt/.onnx/.trt) reveals a
    PyTorch UNet exported to TensorRT; we rebuild it explicitly: depth-4
    encoder/decoder, 64-channel base, two 3x3 conv+ReLU per stage, 2x2
    maxpool, transposed-conv upsampling, skip concats, 1x1 head.
    """

    in_channels: int = 1
    num_classes: int = 3
    base_channels: int = 64
    depth: int = 4  # number of down/up stages (bottleneck excluded)
    image_size: int = 512
    # TPU-native compute dtype; params are stored float32, logits returned
    # float32.  bfloat16 keeps the MXU at full rate.
    compute_dtype: str = "bfloat16"
    # Rematerialize each conv stage in the backward pass (jax.checkpoint):
    # trades FLOPs for HBM so large-batch 512² training fits.
    remat: bool = False
    # 3x3 conv implementation.  "xla" is the product default — measured
    # fastest end-to-end (docs/PERFORMANCE.md).  One experimental alternate
    # is kept as the documented Pallas-kernel exemplar (measured slower
    # in-model; the winograd / fused-level / fold-conv research paths were
    # pruned in round 5 — their measurement memos remain in PERFORMANCE.md):
    #   "experimental_pallas"   VMEM-accumulator kernel (ops/pallas_conv.py)
    conv_impl: str = "xla"
    # Space-to-depth stem factor (UNet only).  stem=2 rearranges the 512²x1
    # input into 256²x4 before the first conv and emits logits through a
    # subpixel (depth-to-space) head, eliminating every 512² internal tensor
    # — the measured HBM-bandwidth bottleneck (docs/PERFORMANCE.md round 3).
    # The serving I/O contract (512² in, 3-class 512² logits out,
    # /root/reference/src/process.cpp:70,162) is unchanged.  stem=1 is the
    # reference-faithful flagship geometry.
    stem: int = 1
    # Model family: "unet" (the reference contract), "unetpp" (nested
    # UNet++, models/unetpp.py) or "attention_unet" (attention-gated skips,
    # models/attention_unet.py).
    arch: str = "unet"
    # UNet++ deep supervision (averaged multi-head logits).
    deep_supervision: bool = False


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Mask cleanup constants (reference src/postprocess.cpp:5-9)."""

    foreground_value: int = 2
    morph_kernel_size: int = 3
    min_area_ratio: float = 0.06


@dataclasses.dataclass(frozen=True)
class ContourConfig:
    """Polygon/JSON emission constants (reference src/mask2polygon.cpp:9-11)."""

    json_version: str = "1.0.2.812"
    # BGR(0,0,255) = red, thickness 1 (src/mask2polygon.cpp:10-11)
    contour_color_bgr: Tuple[int, int, int] = (0, 0, 255)
    contour_thickness: int = 1
    binary_threshold: int = 127  # src/mask2polygon.cpp:31


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline configuration."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    post: PostprocessConfig = dataclasses.field(default_factory=PostprocessConfig)
    contour: ContourConfig = dataclasses.field(default_factory=ContourConfig)
    # Reference fixes the network input at 512x512 (src/process.cpp:70).
    target_size: int = 512
    # Recognised 16-bit input extensions (src/main.cpp:18-25).
    extensions: Tuple[str, ...] = (".raw", ".dcm", ".tif", ".tiff")
    # Batch size used by the batched directory pipeline (reference is serial
    # batch=1; this is the TPU throughput lever, BASELINE config 2).
    batch_size: int = 32


DEFAULT_CONFIG = PipelineConfig()
