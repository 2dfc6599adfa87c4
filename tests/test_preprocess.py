import numpy as np
import pytest

from unetseg_tpu.ops import preprocess as pp


def _reference_loop(raw: np.ndarray, out_size: int = 512) -> np.ndarray:
    """Literal scalar transcription of the semantics of preprocess.cpp:76-118,
    used only as a test oracle-of-the-oracle."""
    h, w = raw.shape
    mn = int(raw.min())
    mx = int(raw.max())
    if mn == mx:
        mx = mn + 1
    scale8 = 255.0 / (mx - mn)
    step_x = w / out_size
    step_y = h / out_size
    out = np.empty((out_size, out_size), np.uint8)
    for y in range(out_size):
        fy = y * step_y
        iy = int(fy)
        iy1 = min(iy + 1, h - 1)
        dy = fy - iy
        for x in range(out_size):
            fx = x * step_x
            ix = int(fx)
            ix1 = min(ix + 1, w - 1)
            dx = fx - ix
            v00 = float(raw[iy, ix])
            v01 = float(raw[iy, ix1])
            v10 = float(raw[iy1, ix])
            v11 = float(raw[iy1, ix1])
            v = ((1 - dx) * (1 - dy)) * v00 + (dx * (1 - dy)) * v01 \
                + ((1 - dx) * dy) * v10 + (dx * dy) * v11
            out[y, x] = int((v - mn) * scale8 + 0.5)
    return out


@pytest.mark.parametrize("shape", [(512, 512), (300, 700), (1000, 640), (100, 100)])
def test_oracle_matches_literal_loop(shape):
    rng = np.random.default_rng(42)
    raw = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    got = pp.preprocess_oracle_u8(raw, out_size=128)
    want = _reference_loop(raw, out_size=128)
    np.testing.assert_array_equal(got, want)


def test_oracle_constant_image():
    raw = np.full((256, 256), 777, np.uint16)
    out = pp.preprocess_oracle_u8(raw)
    # mn==mx => mx=mn+1 => (v-mn)*255 + 0.5 = 0.5 -> 0
    np.testing.assert_array_equal(out, np.zeros((512, 512), np.uint8))


def test_oracle_upsample_path():
    """w < 512: upsampling still follows the same formula."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 65536, size=(64, 48), dtype=np.uint16)
    got = pp.preprocess_oracle_u8(raw, out_size=128)
    want = _reference_loop(raw, out_size=128)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(512, 512), (300, 700), (2048, 1536)])
def test_jax_matches_oracle_closely(shape):
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    want = pp.preprocess_oracle_u8(raw).astype(np.int32)
    got = np.asarray(pp.resize_normalize_u8(raw)).astype(np.int32)
    diff = np.abs(got - want)
    # f32 blend: allow off-by-one on a tiny fraction of pixels.
    assert diff.max() <= 1
    assert (diff > 0).mean() < 5e-3


def test_jax_batch_consistency():
    rng = np.random.default_rng(3)
    raws = rng.integers(0, 65536, size=(4, 256, 320), dtype=np.uint16)
    u8, x = pp.preprocess_batch(raws, out_size=128)
    assert u8.shape == (4, 128, 128) and x.shape == (4, 128, 128, 1)
    for i in range(4):
        single = np.asarray(pp.resize_normalize_u8(raws[i], out_size=128))
        np.testing.assert_array_equal(np.asarray(u8[i]), single)
    np.testing.assert_allclose(
        np.asarray(x[..., 0]), np.asarray(u8).astype(np.float32) / 255.0, atol=1e-6
    )


def test_jax_identity_size():
    """512x512 input: step=1, dx=dy=0 -> pure min-max requantize, exact."""
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 65536, size=(512, 512), dtype=np.uint16)
    want = pp.preprocess_oracle_u8(raw)
    got = np.asarray(pp.resize_normalize_u8(raw))
    # weights are exactly 0/1 here; only the quantize is f32 vs f64
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
