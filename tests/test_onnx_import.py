"""ONNX initializer reader test: round-trip against a hand-encoded
minimal ModelProto (no onnx package in the image, so the test carries its
own protobuf wire-format writer)."""
import numpy as np

from adas_tpu.tools.onnx_import import read_onnx_initializers


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor(name: str, arr: np.ndarray, use_raw: bool = True) -> bytes:
    data_type = {
        np.dtype(np.float32): 1,
        np.dtype(np.int64): 7,
        np.dtype(np.float16): 10,
    }[arr.dtype]
    buf = b""
    for d in arr.shape:
        buf += _field(1, 0, _varint(d))
    buf += _field(2, 0, _varint(data_type))
    buf += _len_field(8, name.encode())
    if use_raw:
        buf += _len_field(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
    elif data_type == 1:
        buf += _len_field(4, arr.astype("<f4").tobytes())  # packed floats
    elif data_type == 7:
        packed = b"".join(_varint(int(v) & (2 ** 64 - 1)) for v in arr.ravel())
        buf += _len_field(7, packed)
    return buf


def _model(tensors) -> bytes:
    graph = b"".join(_len_field(5, t) for t in tensors)
    # some unrelated graph fields to make sure the parser skips them
    graph += _len_field(1, b"\x0a\x00")  # a node
    return _len_field(7, graph) + _field(1, 0, _varint(8))  # ir_version


def test_read_initializers_raw_and_packed(tmp_path, rng):
    w = rng.normal(size=(3, 4, 2)).astype(np.float32)
    b = rng.normal(size=(7,)).astype(np.float32)
    idx = np.array([3, -1, 9], dtype=np.int64)
    half = rng.normal(size=(5,)).astype(np.float16)
    blob = _model([
        _tensor("conv.weight", w, use_raw=True),
        _tensor("conv.bias", b, use_raw=False),
        _tensor("indices", idx, use_raw=False),
        _tensor("half", half, use_raw=True),
    ])
    path = tmp_path / "toy.onnx"
    path.write_bytes(blob)

    inits = read_onnx_initializers(str(path))
    assert set(inits) == {"conv.weight", "conv.bias", "indices", "half"}
    np.testing.assert_array_equal(inits["conv.weight"], w)
    np.testing.assert_allclose(inits["conv.bias"], b, rtol=1e-6)
    np.testing.assert_array_equal(inits["indices"], idx)
    np.testing.assert_array_equal(inits["half"], half)
    assert inits["conv.weight"].shape == (3, 4, 2)
