"""TCP serving daemon: the REPL grammar over newline-delimited JSON."""

import json
import os

import numpy as np
import pytest

from unetseg_tpu import checkpoint, engine, service
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.io import raw as raw_io

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")


@pytest.fixture()
def svc(tmp_path):
    s = service.SegmentationService(port=0)  # ephemeral port
    addr = s.start()
    yield s, addr, tmp_path
    s.stop()


def _setup_data(tmp_path, n=3):
    cache = tmp_path / "engine" / "model.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    rng = np.random.default_rng(0)
    (tmp_path / "data").mkdir()
    for i in range(n):
        raw_io.write_raw(str(tmp_path / "data" / f"s{i}.raw"),
                         rng.integers(0, 65536, (70, 90), np.uint16))
    return str(cache)


def test_service_end_to_end(svc):
    s, addr, tmp_path = svc
    cache = _setup_data(tmp_path)

    r = service.request(addr, {"cmd": "status"})
    assert r == {"ok": True, "initialized": False, "processed": 0,
                 "device_postprocess": False, "partitions": 1,
                 "draining": False}

    # process before init -> clean error
    r = service.request(addr, {"cmd": "process", "path": "x", "width": 1,
                               "height": 1, "output_dir": "y"})
    assert not r["ok"] and "not initialized" in r["error"]

    assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]

    # single image
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "out1")})
    assert r["ok"]
    assert (tmp_path / "out1" / "s0_mask.png").exists()

    # directory (batched path)
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "out2")})
    assert r["ok"] and r["processed"] == 3 and r["failed"] == 0
    for i in range(3):
        assert (tmp_path / "out2" / f"s{i}_mask.png").exists()

    r = service.request(addr, {"cmd": "status"})
    assert r["initialized"] and r["processed"] == 4

    # malformed + unknown commands -> errors, connection survives
    r = service.request(addr, {"cmd": "frobnicate"})
    assert not r["ok"] and "unknown cmd" in r["error"]
    r = service.request(addr, {"cmd": "init"})
    assert not r["ok"] and "requires 'cache'" in r["error"]
    # missing file -> per-request failure, service stays up
    r = service.request(addr, {"cmd": "process", "path": "/nope.raw",
                               "width": 8, "height": 8,
                               "output_dir": str(tmp_path)})
    assert not r["ok"]
    assert service.request(addr, {"cmd": "status"})["ok"]


def test_service_shutdown(tmp_path):
    s = service.SegmentationService(port=0)
    addr = s.start()
    r = service.request(addr, {"cmd": "shutdown"})
    assert r["ok"] and r["shutdown"]
    assert s._server.shutdown_requested
    s.stop()


def test_service_concurrent_requests(tmp_path):
    """Two clients hammering the service concurrently: the device lock
    serializes work, every request gets a coherent response, and all
    artifacts appear (race-safety, SURVEY §5)."""
    import threading

    s = service.SegmentationService(port=0)
    addr = s.start()
    try:
        cache = _setup_data(tmp_path, n=4)
        assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]

        results = {}

        def worker(i):
            results[i] = service.request(addr, {
                "cmd": "process",
                "path": str(tmp_path / "data" / f"s{i}.raw"),
                "width": 90, "height": 70,
                "output_dir": str(tmp_path / f"out{i}")})

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(results[i]["ok"] for i in range(4)), results
        for i in range(4):
            assert (tmp_path / f"out{i}" / f"s{i}_mask.png").exists()
        assert service.request(addr, {"cmd": "status"})["processed"] == 4
    finally:
        s.stop()


def test_service_shutdown_races_inflight_request(tmp_path):
    """Shutdown arriving on one connection while another connection has a
    process in flight: the in-flight request completes with a full response
    and its artifacts, new work is rejected with 'shutting down', and stop()
    does not tear the engine down under the running request."""
    import threading
    import time

    s = service.SegmentationService(port=0)
    addr = s.start()
    try:
        cache = _setup_data(tmp_path, n=4)
        assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]

        inflight = {}

        def long_request():
            inflight["resp"] = service.request(addr, {
                "cmd": "process", "path": str(tmp_path / "data"),
                "width": 90, "height": 70,
                "output_dir": str(tmp_path / "race_out")})

        t = threading.Thread(target=long_request)
        t.start()
        time.sleep(0.3)  # let the directory request take the device lock
        r = service.request(addr, {"cmd": "shutdown"})
        assert r["ok"] and r["shutdown"]
        assert s._server.shutdown_requested

        # new work is refused while draining
        r = service.request(addr, {
            "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
            "width": 90, "height": 70, "output_dir": str(tmp_path)})
        assert not r["ok"] and "shutting down" in r["error"]

        t.join(timeout=300)
        assert inflight["resp"]["ok"], inflight
        assert inflight["resp"]["processed"] == 4
        for i in range(4):
            assert (tmp_path / "race_out" / f"s{i}_mask.png").exists()
    finally:
        s.stop()


def test_service_request_timeout(svc):
    s, addr, tmp_path = svc
    cache = _setup_data(tmp_path, n=1)
    assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "t_out"),
        "timeout_s": 1e-4})
    assert not r["ok"] and "timed out" in r["error"]
    # service stays healthy; the detached work still serializes on the lock
    assert service.request(addr, {"cmd": "status"})["ok"]


def test_service_metrics_endpoint(svc):
    s, addr, tmp_path = svc
    cache = _setup_data(tmp_path, n=2)
    assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]
    for i in range(2):
        assert service.request(addr, {
            "cmd": "process", "path": str(tmp_path / "data" / f"s{i}.raw"),
            "width": 90, "height": 70,
            "output_dir": str(tmp_path / "m_out")})["ok"]
    r = service.request(addr, {"cmd": "metrics", "n": 10})
    assert r["ok"]
    events = [rec["event"] for rec in r["records"]]
    assert "init" in events and events.count("image") == 2
    img = [rec for rec in r["records"] if rec["event"] == "image"][-1]
    assert "inference_ms" in img and "total_ms" in img


def test_service_cascade_init(svc):
    """Cascade routers through the service surface: margin needs only the
    fallback, disagree/both need the co-model too, a bad router is rejected
    before touching the engine, and processing works with the cascade
    attached (engine.process_* auto-routes when _cascade_params is set)."""
    s, addr, tmp_path = svc
    cache = _setup_data(tmp_path, n=2)
    co = str(tmp_path / "engine" / "co.ckpt")
    fb = str(tmp_path / "engine" / "fb.ckpt")
    checkpoint.create(co, SMALL, seed=2)
    checkpoint.create(fb, ModelConfig(base_channels=12, depth=2,
                                      image_size=64,
                                      compute_dtype="float32"), seed=1)

    # invalid router rejected up front
    r = service.request(addr, {"cmd": "init", "cache": cache,
                               "cascade": fb, "cascade_router": "nope"})
    assert not r["ok"] and "cascade_router" in r["error"]

    # disagree/both without a co-model -> init fails honestly
    r = service.request(addr, {"cmd": "init", "cache": cache,
                               "cascade": fb,
                               "cascade_router": "disagree"})
    assert not r["ok"]

    for router in ("disagree", "both"):
        r = service.request(addr, {
            "cmd": "init", "cache": cache, "cascade": fb,
            "cascade_router": router, "cascade_co": co,
            "cascade_threshold": 0.0,          # px: everything routes
            "cascade_margin_threshold": 1.5})
        assert r["ok"], (router, r)
        eng = engine.get_engine()
        assert eng.cascade_router == router
        assert getattr(eng, "_cascade_co_params", None) is not None
        r = service.request(addr, {
            "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
            "width": 90, "height": 70,
            "output_dir": str(tmp_path / f"casc_{router}")})
        assert r["ok"]
        assert (tmp_path / f"casc_{router}" / "s0_mask.png").exists()


def test_cli_serve_arg_parsing(monkeypatch):
    """--serve [HOST:]PORT and --device-post reach service.serve."""
    import sys as _sys

    from unetseg_tpu import cli, service as svc_mod

    calls = {}
    monkeypatch.setattr(
        svc_mod, "serve",
        lambda host, port, device_postprocess=False,
        request_timeout_s=None, partitions=1: calls.update(
            host=host, port=port, dp=device_postprocess,
            timeout=request_timeout_s, partitions=partitions))
    monkeypatch.setattr(_sys, "argv",
                        ["unetseg_tpu", "--serve", "0.0.0.0:9000",
                         "--device-post"])
    assert cli.main() == 0
    assert calls == {"host": "0.0.0.0", "port": 9000, "dp": True,
                     "timeout": None, "partitions": 1}

    monkeypatch.setattr(_sys, "argv", ["unetseg_tpu", "--serve"])
    assert cli.main() == 0
    assert calls["port"] == 8473 and calls["host"] == "127.0.0.1"

    monkeypatch.setattr(_sys, "argv", ["unetseg_tpu", "--serve", "9001",
                                       "--partitions", "4"])
    assert cli.main() == 0
    assert calls["port"] == 9001 and calls["partitions"] == 4


def test_service_partitioned_concurrent_clients(tmp_path):
    """partitions=2: concurrent clients run in PARALLEL on disjoint device
    subsets (no global device lock), artifacts all correct, status reports
    the partition count, shutdown drains the pool."""
    import threading

    s = service.SegmentationService(port=0, partitions=2)
    addr = s.start()
    try:
        cache = _setup_data(tmp_path, n=4)
        assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]
        assert len(s._engines) == 2
        devsets = [frozenset(e.devices) for e in s._engines]
        assert devsets[0].isdisjoint(devsets[1])

        assert service.request(addr, {"cmd": "status"})["partitions"] == 2

        results = {}

        def worker(i):
            results[i] = service.request(addr, {
                "cmd": "process",
                "path": str(tmp_path / "data" / f"s{i}.raw"),
                "width": 90, "height": 70,
                "output_dir": str(tmp_path / f"out{i}")})

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(results[i]["ok"] for i in range(4)), results
        for i in range(4):
            assert (tmp_path / f"out{i}" / f"s{i}_mask.png").exists()
        assert service.request(addr, {"cmd": "status"})["processed"] == 4
        # all engines checked back in
        assert len(s._engines) == 2
    finally:
        s.stop()
    assert s._engines == []  # stop() drained the pool


def test_service_forwards_overlap_zero(svc, monkeypatch):
    """overlap=0 (non-overlapping sliding windows) is a valid request and
    must reach the engine as 0, not be rewritten to the window/2 default
    by a truthiness test (round-4 review finding)."""
    s, addr, tmp_path = svc
    captured = {}

    def fake_process(path, width, height, out_dir, *, tta=False,
                     window=None, overlap=None, per_class=False, eng=None):
        captured.update(window=window, overlap=overlap)
        return True

    monkeypatch.setattr(engine, "get_engine", lambda: object())
    monkeypatch.setattr(engine, "process_single_image", fake_process)
    rp = str(tmp_path / "img.raw")
    raw_io.write_raw(rp, np.zeros((64, 64), np.uint16))
    resp = service.request(addr, {
        "cmd": "process", "path": rp, "width": 64, "height": 64,
        "output_dir": str(tmp_path / "o"), "window": 64, "overlap": 0})
    assert resp["ok"], resp
    assert captured == {"window": 64, "overlap": 0}


def test_service_rejects_silently_dropped_fields(svc):
    """Fields only one path type honors must error, not drop (round-4
    review: directory + tta:true produced un-TTA'd masks with ok:true)."""
    s, addr, tmp_path = svc
    cache = _setup_data(tmp_path, n=1)
    assert service.request(addr, {"cmd": "init", "cache": cache})["ok"]

    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "o"),
        "tta": True})
    assert not r["ok"] and "tta" in r["error"]

    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "o"),
        "tier": "json"})
    assert not r["ok"] and "directory" in r["error"]

    # invalid timeout_s: immediate error, no orphan worker
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data" / "s0.raw"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "o"),
        "timeout_s": "abc"})
    assert not r["ok"] and "timeout_s" in r["error"]

    # the valid forms still work
    r = service.request(addr, {
        "cmd": "process", "path": str(tmp_path / "data"),
        "width": 90, "height": 70, "output_dir": str(tmp_path / "o2"),
        "tier": "json"})
    assert r["ok"]


def test_service_garbage_frames_survive():
    """Raw non-JSON / non-UTF8 frames get error responses and the
    connection (and daemon) survive for subsequent valid requests."""
    import socket

    s = service.SegmentationService(port=0)
    host, port = s.start()
    try:
        with socket.create_connection((host, port), timeout=10) as sock:
            f = sock.makefile("rwb")
            for junk in (b"\xff\xfe\x00binary junk", b"{not json",
                         b"[1, 2,", b'"just a string"'):
                f.write(junk + b"\n")
                f.flush()
                resp = json.loads(f.readline())
                # a bare JSON string parses but is not a request object;
                # either way the contract is an error response, not a drop
                assert resp["ok"] is False and "error" in resp
            f.write(json.dumps({"cmd": "status"}).encode() + b"\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["ok"] and not resp["initialized"]
    finally:
        s.stop()
