"""ONNX initializer import: wire-format reader vs hand-encoded protobuf and
full forward equivalence via a torch-exported-equivalent state_dict."""

import struct

import numpy as np
import pytest

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import import_onnx

SMALL = ModelConfig(base_channels=4, depth=2, image_size=32,
                    compute_dtype="float32")


def test_hand_encoded_tensorproto(tmp_path):
    """Encode a ModelProto byte-by-byte per the protobuf spec and read it."""
    # TensorProto: dims=[2,3] (field1 varint), data_type=1 (field2),
    # name="w" (field8), raw_data (field9)
    data = np.arange(6, dtype="<f4")
    tensor = (
        b"\x08\x02"              # field 1, varint 2
        b"\x08\x03"              # field 1, varint 3
        b"\x10\x01"              # field 2, varint 1 (FLOAT)
        b"\x42\x01w"             # field 8, len 1, "w"
        + b"\x4a\x18" + data.tobytes()  # field 9, len 24
    )
    graph = b"\x2a" + bytes([len(tensor)]) + tensor  # field 5 initializer
    model = b"\x3a" + bytes([len(graph)]) + graph    # field 7 graph
    p = tmp_path / "hand.onnx"
    p.write_bytes(model)
    out = import_onnx.read_initializers(str(p))
    assert set(out) == {"w"}
    np.testing.assert_array_equal(out["w"], data.reshape(2, 3))


def test_float_data_fallback(tmp_path):
    """Tensors stored as packed float_data (field 4) instead of raw_data."""
    floats = struct.pack("<3f", 1.5, -2.0, 3.25)
    tensor = (
        b"\x08\x03"                       # dims [3]
        b"\x10\x01"                       # FLOAT
        b"\x22" + bytes([len(floats)]) + floats +  # field 4 packed
        b"\x42\x01b"                      # name "b"
    )
    graph = b"\x2a" + bytes([len(tensor)]) + tensor
    model = b"\x3a" + bytes([len(graph)]) + graph
    p = tmp_path / "fd.onnx"
    p.write_bytes(model)
    out = import_onnx.read_initializers(str(p))
    np.testing.assert_allclose(out["b"], [1.5, -2.0, 3.25])


def test_roundtrip_and_forward_equivalence(tmp_path):
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from unetseg_tpu.models import unet
    from unetseg_tpu.models.import_torch import build_torch_unet

    tmodel = build_torch_unet(SMALL)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    path = tmp_path / "unet.onnx"
    import_onnx.write_onnx_initializers(str(path), sd)

    params = import_onnx.params_from_onnx(str(path), SMALL)

    rng = np.random.default_rng(0)
    x = rng.random((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = unet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), SMALL)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)
