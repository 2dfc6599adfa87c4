"""Synthetic data families (unetseg_tpu/data.py): shape/label contracts."""

import numpy as np
import pytest

from unetseg_tpu import data


@pytest.mark.parametrize("kind", ["lobulated", "crescent", "illum",
                                  "multiorgan"])
def test_shifted_family_contract(kind):
    rng = np.random.default_rng(7)
    raw, labels = data.synth_slice_shifted(rng, 128, kind)
    assert raw.shape == (128, 128) and raw.dtype == np.uint16
    assert labels.shape == (128, 128) and labels.dtype == np.uint8
    assert set(np.unique(labels)) <= {0, 1, 2}
    assert (labels == 2).sum() > 0  # an organ exists


def test_multiorgan_has_disjoint_components():
    import cv2

    # across a few draws, at least one slice must show >= 2 disjoint
    # foreground components (the family's whole point); single draws may
    # legitimately merge overlapping ellipses into one blob
    rng = np.random.default_rng(3)
    max_comps = 0
    for _ in range(8):
        _, labels = data.synth_slice_shifted(rng, 256, "multiorgan")
        n, _ = cv2.connectedComponents((labels == 2).astype(np.uint8))
        max_comps = max(max_comps, n - 1)  # minus background
    assert max_comps >= 2


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown shift kind"):
        data.synth_slice_shifted(np.random.default_rng(0), 64, "nope")


# ---------------------------------------------------------------------------
# Real-anatomy pool (matplotlib's bundled s1045.ima.gz MR head slice)


def _require_real():
    base = data.real_mri_slice()
    if base is None:
        pytest.skip("matplotlib MRI sample unavailable")
    return base


def test_real_mri_slice_contract():
    base = _require_real()
    assert base.shape == (256, 256) and base.dtype == np.uint16
    assert base.max() > base.min()  # genuine dynamic range
    again = data.real_mri_slice()
    assert np.array_equal(base, again)  # deterministic
    assert base.flags.writeable  # a copy, not a frombuffer view


def test_real_mri_pool_contract():
    base = _require_real()
    pool = data.real_mri_pool()
    assert len(pool) == 13
    names = [n for n, _ in pool]
    assert len(set(names)) == 13
    base_hist = np.bincount(base.ravel(), minlength=65536)
    for name, arr in pool:
        assert arr.ndim == 2 and arr.dtype == np.uint16
        assert arr.flags.c_contiguous
        if name.startswith("rot"):
            # dihedral variants permute pixels: identical histogram
            assert arr.shape == (256, 256)
            assert np.array_equal(
                np.bincount(arr.ravel(), minlength=65536), base_hist)
        elif name.startswith("crop"):
            c = arr.shape[0]
            o = (256 - c) // 2
            assert np.array_equal(arr, base[o:o + c, o:o + c])


def test_real_mri_mosaic_contract():
    base = _require_real()
    m = data.real_mri_mosaic(2)
    assert m.shape == (512, 512) and m.dtype == np.uint16
    assert m.flags.c_contiguous
    # top-left tile is the identity orientation, byte-for-byte real pixels
    assert np.array_equal(m[:256, :256], base)
    # deterministic
    assert np.array_equal(m, data.real_mri_mosaic(2))
    m3 = data.real_mri_mosaic(3)
    assert m3.shape == (768, 768)


def test_real_mri_512_contract():
    base = _require_real()
    big = data.real_mri_512()
    assert big.shape == (512, 512) and big.dtype == np.uint16
    assert big.flags.c_contiguous
    # the 512->512 identity grid of the oracle preprocess makes the two
    # quantizations comparable: u8(oracle(base)) and u8(oracle(big)) may
    # differ only by the u16 rounding (<= 1 LSB after the 255/(mx-mn) scale)
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    a = preprocess_oracle_u8(base, 512)
    b = preprocess_oracle_u8(big, 512)
    assert int(np.abs(a.astype(np.int16) - b.astype(np.int16)).max()) <= 1
    # even output positions sample the source grid exactly (step = 0.5)
    assert np.array_equal(big[::2, ::2], base)
    assert np.array_equal(big, data.real_mri_512())


def test_real_mri_through_bitexact_preprocess():
    # the real intensity distribution must flow through the bit-exact
    # native preprocess identically to the float64 oracle (the parity
    # claim exercised on non-synthetic pixels)
    from unetseg_tpu.io import native
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    base = _require_real()
    for _, arr in data.real_mri_pool()[::5]:  # 3 variants is enough here
        oracle = preprocess_oracle_u8(arr, 512)
        fast = native.preprocess_u8(arr, 512)
        assert np.array_equal(oracle, fast)
