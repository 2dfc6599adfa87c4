"""Failure isolation, concurrency, and input-validation behavior.

SURVEY §5: the reference's fault handling is per-image isolation (directory
batches continue past failures) and it harbors a latent host-staging race
its thread_local contexts don't fix (src/process.cpp:138,152).  Our pipeline
is functional end-to-end; these tests pin the isolation semantics and
demonstrate thread-safety the reference lacks.
"""

import threading

import numpy as np
import pytest

from unetseg_tpu import checkpoint, engine
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.io import raw as raw_io

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")


@pytest.fixture()
def eng(tmp_path):
    cache = tmp_path / "e" / "m.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    assert engine.initialize_engine(str(cache))
    yield
    engine.cleanup_resources()


def _raw(path, w=64, h=64, seed=0):
    rng = np.random.default_rng(seed)
    raw_io.write_raw(str(path), rng.integers(0, 65536, (h, w), np.uint16))


def test_raw_too_small_rejected(tmp_path):
    (tmp_path / "tiny.raw").write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="too small"):
        raw_io.read_raw(str(tmp_path / "tiny.raw"), 64, 64)


def test_batch_continues_past_bad_file(eng, tmp_path):
    """Per-image isolation: a truncated file fails, the rest succeed
    (parity with src/main.cpp:159-163 tallies)."""
    good1 = tmp_path / "a.raw"
    bad = tmp_path / "b.raw"
    good2 = tmp_path / "c.raw"
    _raw(good1, seed=1)
    bad.write_bytes(b"\x00" * 10)  # truncated
    _raw(good2, seed=2)

    ok = fail = 0
    for p in (good1, bad, good2):
        if engine.process_single_image(str(p), 64, 64, str(tmp_path / "o")):
            ok += 1
        else:
            fail += 1
    assert ok == 2 and fail == 1
    assert (tmp_path / "o" / "a_mask.png").exists()
    assert (tmp_path / "o" / "c_mask.png").exists()
    assert not (tmp_path / "o" / "b_mask.png").exists()


def test_batched_continues_past_bad_file(eng, tmp_path):
    """process_batch honors the same per-image isolation as the serial loop
    (docstring contract, src/main.cpp:159-163): a truncated file drops only
    that slice.  Previously the loader exception aborted the whole batch
    (round-4 review finding)."""
    good1 = tmp_path / "a.raw"
    bad = tmp_path / "b.raw"
    good2 = tmp_path / "c.raw"
    _raw(good1, seed=1)
    bad.write_bytes(b"\x00" * 10)  # truncated
    _raw(good2, seed=2)
    out = tmp_path / "o"
    n_ok, n_fail = engine.process_batch(
        [str(good1), str(bad), str(good2)], 64, 64, [str(out)] * 3)
    assert (n_ok, n_fail) == (2, 1)
    assert (out / "a_mask.png").exists()
    assert (out / "c_mask.png").exists()
    assert not (out / "b_mask.png").exists()
    # artifacts byte-match the serial path for the surviving slices
    out_serial = tmp_path / "s"
    assert engine.process_single_image(str(good1), 64, 64, str(out_serial))
    for suffix in ("_mask.png", ".json"):
        assert (out / ("a" + suffix)).read_bytes() == \
            (out_serial / ("a" + suffix)).read_bytes()

    # an all-bad chunk fails cleanly too
    n_ok, n_fail = engine.process_batch(
        [str(bad), str(bad)], 64, 64, [str(out)] * 2)
    assert (n_ok, n_fail) == (0, 2)


def test_failed_reinit_never_leaves_stale_engine(tmp_path):
    """EVERY initialize_engine failure path leaves nothing servable — the
    early returns (missing cache file) included, not just the late ones
    (round-4 review finding: a typo'd re-init kept serving checkpoint A
    while reporting failure)."""
    cache = tmp_path / "m.ckpt"
    checkpoint.create(str(cache), SMALL, seed=0)
    try:
        assert engine.initialize_engine(str(cache))
        assert engine.get_engine() is not None
        assert not engine.initialize_engine(str(tmp_path / "typo.ckpt"))
        assert engine.get_engine() is None
        rp = tmp_path / "x.raw"
        _raw(rp)
        assert not engine.process_single_image(str(rp), 64, 64,
                                               str(tmp_path / "o"))
    finally:
        engine.cleanup_resources()


def test_device_trace_propagates_body_error(tmp_path):
    """device_trace swallows profiler start/stop failures only; the traced
    body's own exception must surface unchanged (round-4 review finding:
    a second yield in the except handler turned body errors into
    contextlib RuntimeErrors)."""
    from unetseg_tpu.utils.profiling import device_trace

    with pytest.raises(ValueError, match="boom"):
        with device_trace(None):
            raise ValueError("boom")
    with pytest.raises(ValueError, match="boom"):
        with device_trace(str(tmp_path / "trace")):
            raise ValueError("boom")


def test_concurrent_process_calls(eng, tmp_path):
    """Two threads through the full pipeline: the reference's shared static
    staging buffers would race here; our functional path must not."""
    paths = []
    for i in range(4):
        p = tmp_path / f"t{i}.raw"
        _raw(p, seed=10 + i)
        paths.append(p)

    results = {}

    def work(i, p):
        out = tmp_path / f"out{i % 2}"
        results[i] = engine.process_single_image(str(p), 64, 64, str(out))

    threads = [
        threading.Thread(target=work, args=(i, p))
        for i, p in enumerate(paths)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results.values())
    # masks must match a serial re-run (no cross-thread corruption)
    import cv2

    for i, p in enumerate(paths):
        serial_out = tmp_path / "serial"
        assert engine.process_single_image(str(p), 64, 64, str(serial_out))
        a = cv2.imread(str(tmp_path / f"out{i % 2}" / f"t{i}_mask.png"),
                       cv2.IMREAD_GRAYSCALE)
        b = cv2.imread(str(serial_out / f"t{i}_mask.png"),
                       cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(a, b)


def test_u16_normalization_path():
    """API-parity: the reference's 16-bit input branch (process.cpp:30-34)."""
    from unetseg_tpu.ops.preprocess import model_input_from_u16

    x = np.array([[0, 65535]], np.uint16)
    out = np.asarray(model_input_from_u16(x))
    np.testing.assert_allclose(out, [[0.0, 1.0]], atol=1e-7)


def test_cli_invalid_numbers(tmp_path, capsys):
    import io

    from unetseg_tpu import cli

    cache = tmp_path / "e" / "m.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    script = "\n".join([
        f"init {cache}",
        "process somefile.raw abc def",   # non-numeric dims
        "process onlypath.raw",           # missing dims
        "init",                           # missing cache path
        "exit",
    ]) + "\n"
    cli.repl(stdin=io.StringIO(script))
    err = capsys.readouterr().err
    assert err.count("Error: Invalid process command") == 2
    assert "Error: Missing engine cache path" in err


def test_window_larger_than_image(eng, tmp_path):
    """--window bigger than the image degrades to single-tile inference."""
    p = tmp_path / "small.raw"
    _raw(p, w=48, h=40, seed=3)
    out = tmp_path / "wout"
    assert engine.process_single_image(str(p), 48, 40, str(out),
                                       window=512, overlap=128)
    import cv2

    vis = cv2.imread(str(out / "small_mask.png"), cv2.IMREAD_GRAYSCALE)
    assert vis.shape == (40, 48)
