"""PyTorch checkpoint import — the reference's .pt -> engine chain, rebuilt.

The reference's model arrives as PyTorch -> ONNX -> TensorRT
(``/root/reference/.gitignore:2-7``); the training side lives outside its
repo.  Here the chain is ``.pt state_dict -> JAX pytree``: OIHW conv weights
transpose to HWIO, ConvTranspose2d (IOHW) weights to HWIO, and optional
BatchNorm layers fold into the preceding conv (inference-mode fusion), so a
torch-trained UNet drops straight into the TPU engine.

Canonical torch module naming (see :func:`build_torch_unet`):

    encoder.{i}.conv1 / conv2      Conv2d 3x3
    bottleneck.conv1 / conv2       Conv2d 3x3
    decoder.{i}.up                 ConvTranspose2d 2x2 stride 2
    decoder.{i}.conv1 / conv2      Conv2d 3x3
    head                           Conv2d 1x1
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from unetseg_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv(sd: Dict, prefix: str) -> dict:
    w = _np(sd[prefix + ".weight"])  # OIHW
    b = _np(sd[prefix + ".bias"])
    return {"w": np.transpose(w, (2, 3, 1, 0)).copy(), "b": b.copy()}


def _conv_transpose(sd: Dict, prefix: str) -> dict:
    w = _np(sd[prefix + ".weight"])  # torch ConvTranspose2d: (in, out, kh, kw)
    b = _np(sd[prefix + ".bias"])
    # lax.conv_transpose places the kernel spatially rot-180 relative to
    # torch's scatter semantics, so flip H/W then lay out as HWIO
    # (validated numerically in tests/test_torch_import.py).
    w = np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    return {"w": w, "b": b.copy()}


def fold_batchnorm(conv: dict, gamma, beta, mean, var, eps: float = 1e-5) -> dict:
    """Fuse y = BN(conv(x)) into a single conv (inference mode)."""
    gamma, beta, mean, var = map(_np, (gamma, beta, mean, var))
    scale = gamma / np.sqrt(var + eps)
    return {
        "w": conv["w"] * scale[None, None, None, :],
        "b": (conv["b"] - mean) * scale + beta,
    }


def convert_state_dict(state_dict: Dict, cfg: ModelConfig = ModelConfig()) -> dict:
    """Map the canonical torch UNet state_dict to our parameter pytree."""
    sd = dict(state_dict)
    params: dict = {"encoder": [], "decoder": []}
    for i in range(cfg.depth):
        params["encoder"].append({
            "conv1": _conv(sd, f"encoder.{i}.conv1"),
            "conv2": _conv(sd, f"encoder.{i}.conv2"),
        })
    params["bottleneck"] = {
        "conv1": _conv(sd, "bottleneck.conv1"),
        "conv2": _conv(sd, "bottleneck.conv2"),
    }
    for i in range(cfg.depth):
        params["decoder"].append({
            "up": _conv_transpose(sd, f"decoder.{i}.up"),
            "conv1": _conv(sd, f"decoder.{i}.conv1"),
            "conv2": _conv(sd, f"decoder.{i}.conv2"),
        })
    params["head"] = _conv(sd, "head")

    import jax.numpy as jnp

    return _tree_map_np_to_jnp(params, jnp)


def _tree_map_np_to_jnp(tree, jnp):
    if isinstance(tree, dict):
        return {k: _tree_map_np_to_jnp(v, jnp) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_np_to_jnp(v, jnp) for v in tree]
    return jnp.asarray(tree, jnp.float32)


def build_torch_unet(cfg: ModelConfig = ModelConfig()):
    """The canonical torch module (for tests and for users exporting .pt)."""
    import torch
    from torch import nn

    class DoubleConv(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)

        def forward(self, x):
            x = torch.relu(self.conv1(x))
            return torch.relu(self.conv2(x))

    class Up(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.up = nn.ConvTranspose2d(cin, cout, 2, stride=2)
            self.conv1 = nn.Conv2d(cout * 2, cout, 3, padding=1)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)

        def forward(self, x, skip):
            x = self.up(x)
            x = torch.cat([skip, x], dim=1)
            x = torch.relu(self.conv1(x))
            return torch.relu(self.conv2(x))

    class TorchUNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [cfg.base_channels * (2**i) for i in range(cfg.depth)]
            bott = cfg.base_channels * (2**cfg.depth)
            self.encoder = nn.ModuleList()
            cin = cfg.in_channels
            for c in chans:
                self.encoder.append(DoubleConv(cin, c))
                cin = c
            self.bottleneck = DoubleConv(chans[-1], bott)
            self.decoder = nn.ModuleList()
            cin = bott
            for c in reversed(chans):
                self.decoder.append(Up(cin, c))
                cin = c
            self.head = nn.Conv2d(chans[0], cfg.num_classes, 1)
            self.pool = nn.MaxPool2d(2)

        def forward(self, x):
            skips = []
            for enc in self.encoder:
                x = enc(x)
                skips.append(x)
                x = self.pool(x)
            x = self.bottleneck(x)
            for dec, skip in zip(self.decoder, reversed(skips)):
                x = dec(x, skip)
            return self.head(x)

    return TorchUNet()
