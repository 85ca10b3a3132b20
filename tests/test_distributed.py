"""Multi-process (DCN-analog) execution test.

Spawns TWO real OS processes that wire ``jax.distributed`` over a local
coordinator (CPU backend, gloo collectives), build ONE global 4-device dp
mesh (2 virtual devices per process), and run a cross-process
``sharded_riptrm_solve`` whose residual ``all_gather`` crosses the process
boundary.  This is the executable proof of
``riptrm_tpu/parallel/distributed.py`` (SURVEY §2.3 distributed-backend
row); the reference's only scale-out is independent Hydra-multirun
processes with no cross-process communication at all.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_sweep(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The worker forces the CPU platform itself; drop any device-count flag
    # inherited from this process so the worker's own setting wins.
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "distributed_worker.py")

    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), addr, out],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, (
            f"worker failed (rc={p.returncode}):\n"
            f"{stderr.decode()[-2000:]}"
        )
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))

    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["local_devices"] == 2
    # host_shard: disjoint round-robin split covering all jobs
    shards = [set(r["host_shard"]) for r in results]
    assert shards[0] | shards[1] == set(range(7))
    assert shards[0] & shards[1] == set()
    # the all_gather'd residuals are identical on both processes and the
    # cross-process sweep converged on every lane
    res0, res1 = (np.asarray(r["residuals"]) for r in results)
    np.testing.assert_array_equal(res0, res1)
    assert res0.shape == (8,)
    assert np.all(res0 < 1e-3), res0
