"""Multi-host DCN capability, proven with a real 2-process cluster.

SURVEY §2 distributed row / VERDICT r2 item 6: `jax.distributed.initialize`
+ `global_mesh` exercised by two actual OS processes over a localhost
coordinator (the CPU stand-in for DCN), running a sharded train step whose
gradient all-reduce crosses the process boundary, plus the study-level
sharding split.  The single-process no-op path is covered in
tests/test_engine_e2e.py.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "dcn_child.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_cluster(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO

    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(port), str(pid), "2", str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}"

    results = {}
    for pid in (0, 1):
        with open(tmp_path / f"proc{pid}.json") as f:
            results[pid] = json.load(f)

    # both processes saw the 4-device global mesh and agreed on the loss
    # (the gradient all-reduce crossed the process boundary)
    assert results[0]["devices"] == results[1]["devices"] == 4
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # study-level sharding: disjoint halves covering all studies
    s0, s1 = set(results[0]["studies"]), set(results[1]["studies"])
    assert s0.isdisjoint(s1)
    assert s0 | s1 == {f"study_{i}" for i in range(5)}
    assert abs(len(s0) - len(s1)) <= 1
