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
