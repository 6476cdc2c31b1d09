"""True multi-process (multi-controller) parity: two OS processes, each
with 2 virtual CPU devices, join a gloo-backed jax.distributed cluster and
train the dp-sharded step; the loss trajectory must match (a) across the two
processes and (b) a single-process run on the same 4-device mesh shape.

This is the CPU stand-in for multi-host TPU bring-up
(parallel/mesh.py:initialize_multiprocess); SURVEY.md §4c.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_parity(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_worker.py"),
             str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    r0, r1 = (json.loads(o.read_text()) for o in outs)
    # (a) the replicated loss is byte-identical across controllers
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["fingerprint"] == pytest.approx(r1["fingerprint"], rel=1e-7)

    # (b) matches one process driving the same 4-device dp mesh
    if len(jax.devices()) < 4:
        pytest.skip("need 4 virtual devices for the single-process reference")
    from _mp_case import run_case
    from rrtmil_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
    losses_ref, fp_ref = run_case(mesh)
    np.testing.assert_allclose(r0["losses"], losses_ref, rtol=1e-5)
    assert r0["fingerprint"] == pytest.approx(fp_ref, rel=1e-5)
