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


# -- round-4 review fixes: real BN nodes, attr validation, epsilon ------------

def _unet_d1_nodes(with_bn: bool):
    """Depth-1 UNet graph (op tuples for write_onnx_graph); BN after the
    first encoder conv (OIHW axis-0 fold) and after the ConvTranspose
    (IOHW axis-1 fold) when with_bn."""
    k3 = {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1]}
    k1 = {"kernel_shape": [1, 1], "pads": [0, 0, 0, 0]}
    up_a = {"kernel_shape": [2, 2], "strides": [2, 2]}
    nodes = [("Conv", ["x", "e0c1_w", "e0c1_b"], ["t1"], k3)]
    if with_bn:
        nodes += [("BatchNormalization",
                   ["t1", "bn1_g", "bn1_b", "bn1_m", "bn1_v"], ["t1b"],
                   {"epsilon": 1e-3})]
    nodes += [
        ("Relu", ["t1b" if with_bn else "t1"], ["r1"], None),
        ("Conv", ["r1", "e0c2_w", "e0c2_b"], ["t2"], k3),
        ("Relu", ["t2"], ["r2"], None),
        ("MaxPool", ["r2"], ["p1"], {"kernel_shape": [2, 2],
                                     "strides": [2, 2]}),
        ("Conv", ["p1", "b1_w", "b1_b"], ["t3"], k3),
        ("Relu", ["t3"], ["r3"], None),
        ("Conv", ["r3", "b2_w", "b2_b"], ["t4"], k3),
        ("Relu", ["t4"], ["r4"], None),
        ("ConvTranspose", ["r4", "up_w", "up_b"], ["u1"], up_a),
    ]
    if with_bn:
        nodes += [("BatchNormalization",
                   ["u1", "bn2_g", "bn2_b", "bn2_m", "bn2_v"], ["u1b"],
                   {"epsilon": 1e-3})]
    nodes += [
        ("Concat", [("u1b" if with_bn else "u1"), "r2"], ["c1"], {"axis": 1}),
        ("Conv", ["c1", "d1_w", "d1_b"], ["t5"], k3),
        ("Relu", ["t5"], ["r5"], None),
        ("Conv", ["r5", "d2_w", "d2_b"], ["t6"], k3),
        ("Relu", ["t6"], ["r6"], None),
        ("Conv", ["r6", "h_w", "h_b"], ["y"], k1),
    ]
    return nodes


def _unet_d1_tensors(rng):
    t = {
        "e0c1_w": rng.standard_normal((4, 1, 3, 3)),
        "e0c2_w": rng.standard_normal((4, 4, 3, 3)),
        "b1_w": rng.standard_normal((8, 4, 3, 3)),
        "b2_w": rng.standard_normal((8, 8, 3, 3)),
        "up_w": rng.standard_normal((8, 4, 2, 2)),   # IOHW
        "d1_w": rng.standard_normal((4, 8, 3, 3)),
        "d2_w": rng.standard_normal((4, 4, 3, 3)),
        "h_w": rng.standard_normal((3, 4, 1, 1)),
    }
    for k in list(t):
        t[k.replace("_w", "_b")] = rng.standard_normal(
            t[k].shape[1] if k == "up_w" else t[k].shape[0])
    return {k: v.astype(np.float32) for k, v in t.items()}


def test_bn_node_folds_on_raw_layout_axes(tmp_path):
    """A graph with LIVE BatchNormalization nodes (the torch exporter
    pre-fuses Conv+BN, so real-exporter fixtures never reach this path):
    folding must scale OIHW convs on axis 0 and IOHW ConvTranspose on
    axis 1, honoring the float epsilon attribute — the old code reused the
    HWIO (last-axis) fold and crashed or silently corrupted weights."""
    rng = np.random.default_rng(3)
    tens = _unet_d1_tensors(rng)
    bn = {
        "bn1_g": rng.standard_normal(4) * 0.5 + 1.0,
        "bn1_b": rng.standard_normal(4),
        "bn1_m": rng.standard_normal(4),
        "bn1_v": rng.random(4) + 0.1,
        "bn2_g": rng.standard_normal(4) * 0.5 + 1.0,
        "bn2_b": rng.standard_normal(4),
        "bn2_m": rng.standard_normal(4),
        "bn2_v": rng.random(4) + 0.1,
    }
    bn = {k: v.astype(np.float32) for k, v in bn.items()}
    p_bn = tmp_path / "with_bn.onnx"
    import_onnx.write_onnx_graph(
        str(p_bn), _unet_d1_nodes(True), {**tens, **bn})

    # reference: fold by hand on the RAW layouts with eps=1e-3
    eps = np.float32(1e-3)
    folded = dict(tens)
    s1 = bn["bn1_g"] / np.sqrt(bn["bn1_v"] + eps)
    folded["e0c1_w"] = tens["e0c1_w"] * s1[:, None, None, None]   # OIHW ax0
    folded["e0c1_b"] = (tens["e0c1_b"] - bn["bn1_m"]) * s1 + bn["bn1_b"]
    s2 = bn["bn2_g"] / np.sqrt(bn["bn2_v"] + eps)
    folded["up_w"] = tens["up_w"] * s2[None, :, None, None]       # IOHW ax1
    folded["up_b"] = (tens["up_b"] - bn["bn2_m"]) * s2 + bn["bn2_b"]
    p_ref = tmp_path / "prefolded.onnx"
    import_onnx.write_onnx_graph(str(p_ref), _unet_d1_nodes(False), folded)

    got, cfg = import_onnx.load_onnx(str(p_bn))
    want, cfg2 = import_onnx.load_onnx(str(p_ref))
    assert cfg == cfg2
    assert (cfg.depth, cfg.base_channels, cfg.num_classes) == (1, 4, 3)
    import jax
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-6,
                                   atol=2e-6)


def test_off_family_attrs_rejected(tmp_path):
    """Conv strides/dilations/groups or pool geometry outside the UNet
    family must raise, not graft silently into different semantics."""
    rng = np.random.default_rng(4)
    tens = _unet_d1_tensors(rng)

    def build(mutate):
        nodes = _unet_d1_nodes(False)
        out = []
        for op, i, o, a in nodes:
            a = dict(a) if a else None
            out.append(mutate(op, i, o, a))
        p = tmp_path / "bad.onnx"
        import_onnx.write_onnx_graph(str(p), out, tens)
        return str(p)

    def strided(op, i, o, a):
        if op == "Conv" and i[1] == "e0c1_w":
            a["strides"] = [2, 2]
        return (op, i, o, a)

    with pytest.raises(ValueError, match="strides"):
        import_onnx.load_onnx(build(strided))

    def grouped(op, i, o, a):
        if op == "Conv" and i[1] == "b1_w":
            a["group"] = 2
        return (op, i, o, a)

    with pytest.raises(ValueError, match="group"):
        import_onnx.load_onnx(build(grouped))

    def big_pool(op, i, o, a):
        if op == "MaxPool":
            a["kernel_shape"] = [3, 3]
        return (op, i, o, a)

    with pytest.raises(ValueError, match="MaxPool"):
        import_onnx.load_onnx(build(big_pool))

    def valid_pads(op, i, o, a):
        return (op, i, o, a)

    got, cfg = import_onnx.load_onnx(build(valid_pads))  # sanity: base loads
    assert cfg.depth == 1
