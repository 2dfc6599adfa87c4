"""Minimal ONNX weight import — no `onnx` package required.

The reference's artifact chain is PyTorch -> ONNX -> TensorRT
(``/root/reference/.gitignore:2-7``); users holding only the intermediate
``.onnx`` file can import its weights here.  ONNX is protobuf; we only need
the graph initializers, so this module walks the protobuf wire format
directly (spec: protobuf encoding + onnx.proto3 field numbers):

    ModelProto.graph        = field 7  (message)
    GraphProto.initializer  = field 5  (repeated TensorProto)
    TensorProto.dims        = field 1  (repeated int64)
    TensorProto.data_type   = field 2  (enum; FLOAT=1, DOUBLE=11, INT64=7)
    TensorProto.float_data  = field 4  (packed floats)
    TensorProto.name        = field 8  (string)
    TensorProto.raw_data    = field 9  (bytes, little-endian)

Initializer names from the (TorchScript-based) torch exporter match the
state_dict keys, so the tensors feed straight into
:func:`unetseg_tpu.models.import_torch.convert_state_dict`.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np

from unetseg_tpu.config import ModelConfig

_FLOAT, _INT64, _DOUBLE = 1, 7, 11
_DTYPES = {_FLOAT: np.float32, _INT64: np.int64, _DOUBLE: np.float64}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf: bytes):
    dims = []
    dtype = _FLOAT
    name = ""
    raw = None
    floats = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 2 and wire == 0:
            dtype = val
        elif field == 4:
            if wire == 2:  # packed floats
                floats.extend(struct.unpack(f"<{len(val)//4}f", val))
            elif wire == 5:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 8 and wire == 2:
            name = val.decode("utf-8")
        elif field == 9 and wire == 2:
            raw = val
    np_dtype = _DTYPES.get(dtype)
    if np_dtype is None:
        return name, None  # unsupported dtype: skip
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np.dtype(np_dtype).newbyteorder("<"))
    else:
        arr = np.asarray(floats, np_dtype)
    return name, arr.reshape(dims).astype(np_dtype)


def read_initializers(path: str) -> Dict[str, np.ndarray]:
    """Extract all named initializer tensors from an .onnx file."""
    with open(path, "rb") as f:
        model = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, wire, graph in _fields(model):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, tensor in _fields(graph):
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(tensor)
                    if arr is not None and name:
                        out[name] = arr
    return out


def params_from_onnx(path: str, cfg: ModelConfig = ModelConfig()):
    """.onnx -> parameter pytree (via the canonical state_dict naming)."""
    from unetseg_tpu.models.import_torch import convert_state_dict

    return convert_state_dict(read_initializers(path), cfg)


# --------------------------------------------------------------------------
# Minimal writer (tests / tooling): emits exactly the subset we read.
# --------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def write_onnx_initializers(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Write a minimal ModelProto holding only graph initializers."""
    graph = bytearray()
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, np.float32)
        t = bytearray()
        for d in arr.shape:
            t += _varint(8) + _varint(d)          # dims (field 1, varint)
        t += _varint(16) + _varint(_FLOAT)        # data_type (field 2)
        t += _ld(8, name.encode())                # name
        t += _ld(9, arr.astype("<f4").tobytes())  # raw_data
        graph += _ld(5, bytes(t))                 # initializer
    with open(path, "wb") as f:
        f.write(_ld(7, bytes(graph)))             # ModelProto.graph
