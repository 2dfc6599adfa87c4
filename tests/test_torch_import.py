"""Torch -> JAX weight import: numerical equivalence of the two forwards."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.models.import_torch import (
    build_torch_unet,
    convert_state_dict,
    fold_batchnorm,
)

SMALL = ModelConfig(base_channels=4, depth=2, image_size=32, compute_dtype="float32")


def test_torch_roundtrip_forward_equivalence():
    tmodel = build_torch_unet(SMALL)
    tmodel.eval()
    params = convert_state_dict(tmodel.state_dict(), SMALL)

    rng = np.random.default_rng(0)
    x = rng.random((2, 1, 32, 32)).astype(np.float32)  # NCHW for torch
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()  # (N, C, H, W)

    got = unet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), SMALL)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bn_folding():
    cin, cout = 3, 5
    conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
    bn = torch.nn.BatchNorm2d(cout)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()

    x = torch.randn(1, cin, 8, 8)
    with torch.no_grad():
        want = bn(conv(x)).numpy()

    jconv = {
        "w": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
        "b": conv.bias.detach().numpy(),
    }
    folded = fold_batchnorm(
        jconv, bn.weight, bn.bias, bn.running_mean, bn.running_var, bn.eps
    )
    import jax

    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(folded["w"]),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + folded["b"]
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
    )


def test_checkpoint_from_torch(tmp_path):
    from unetseg_tpu import checkpoint

    tmodel = build_torch_unet(SMALL)
    params = convert_state_dict(tmodel.state_dict(), SMALL)
    path = tmp_path / "from_torch.ckpt"
    checkpoint.save(str(path), params, SMALL)
    params2, cfg2 = checkpoint.load(str(path))
    assert cfg2 == SMALL
    x = jnp.zeros((1, 32, 32, 1))
    a = unet.apply(params, x, SMALL)
    b = unet.apply(params2, x, SMALL)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
