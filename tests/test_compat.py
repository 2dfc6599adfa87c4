"""Reference-shaped API surface (unetseg_tpu.compat) behaves like the C++."""

import cv2
import numpy as np

from unetseg_tpu import compat
from unetseg_tpu.io import jsonfmt, raw as raw_io
from unetseg_tpu.ops.preprocess import preprocess_oracle_u8


def test_preprocess_raw_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, size=(60, 90), dtype=np.uint16)
    raw_io.write_raw(str(tmp_path / "a.raw"), img)
    ok = compat.preprocess_raw(
        str(tmp_path / "a.raw"), str(tmp_path / "a.png"),
        str(tmp_path / "a.json"), 90, 60,
    )
    assert ok
    got = cv2.imread(str(tmp_path / "a.png"), cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(got, preprocess_oracle_u8(img, 512))
    assert (tmp_path / "a.json").read_bytes() == jsonfmt.size_json_bytes(
        "a.raw", 90, 60, 512, 512
    )


def test_preprocess_raw_missing_file(tmp_path, capsys):
    assert not compat.preprocess_raw(
        str(tmp_path / "nope.raw"), str(tmp_path / "x.png"),
        str(tmp_path / "x.json"), 10, 10,
    )
    assert "preprocess_raw error" in capsys.readouterr().out


def test_process_single_mask_full_chain(tmp_path, capsys):
    # build a mask png + size json + original png, then run the polygonizer
    mask = np.zeros((64, 64), np.uint8)
    cv2.circle(mask, (32, 32), 20, 255, -1)
    cv2.imwrite(str(tmp_path / "b_mask.png"), mask)
    with open(tmp_path / "b_sizes.json", "wb") as f:
        f.write(jsonfmt.size_json_bytes("b.raw", 128, 256, 64, 64))
    cv2.imwrite(str(tmp_path / "b_norm.png"),
                np.full((64, 64), 128, np.uint8))

    compat.process_single_mask(
        str(tmp_path / "b_mask.png"), str(tmp_path),
        str(tmp_path / "b_sizes.json"), str(tmp_path / "b_norm.png"), "b",
    )
    out = capsys.readouterr().out
    assert "Extracted 1 Contours" in out
    assert (tmp_path / "b.json").exists()
    assert (tmp_path / "b_contour_overlay.png").exists()

    # byte parity with the cv2-derived oracle
    cs, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    pts = [[tuple(int(v) for v in p) for p in c.reshape(-1, 2)] for c in cs]
    mapped = [[(int(x * 2), int(y * 4)) for x, y in c] for c in pts]
    assert (tmp_path / "b.json").read_bytes() == jsonfmt.contour_json_bytes(
        mapped, "b", 128, 256
    )


def test_process_single_mask_size_mismatch_swallowed(tmp_path, capsys):
    mask = np.zeros((32, 32), np.uint8)
    cv2.imwrite(str(tmp_path / "c_mask.png"), mask)
    with open(tmp_path / "c_sizes.json", "wb") as f:
        f.write(jsonfmt.size_json_bytes("c.raw", 100, 100, 64, 64))
    # reference swallows its own exceptions (src/mask2polygon.cpp:219-221)
    compat.process_single_mask(
        str(tmp_path / "c_mask.png"), str(tmp_path),
        str(tmp_path / "c_sizes.json"), "", "c",
    )
    assert "Processing Failure" in capsys.readouterr().out


def test_postprocess_and_lut():
    mask = np.zeros((64, 64), np.uint8)
    cv2.circle(mask, (32, 32), 20, 2, -1)
    out = compat.postprocess_mask(mask)
    assert set(np.unique(out)).issubset({0, 2})
    vis = compat.mask_to_image(np.array([[0, 1, 2]], np.uint8))
    np.testing.assert_array_equal(vis, [[0, 128, 255]])
