"""TRUE multi-process data parallelism (SURVEY §2.2 P1/P9 at HOST scale):
two jax.distributed processes, each owning 2 virtual CPU devices, build
one 4-device global mesh, assemble the global batch from per-host shards
(make_array_from_process_local_data), run the sharded train step with
replicated params — and the loss must equal the single-process step on
the same global batch bit-for-bit.  This exercises the actual multi-host
code path (train/distributed.py + train/step.py) that a v5e pod uses,
not just the single-process virtual mesh of the other sharding tests."""

import os
import re
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_matches_single():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub this
    # process's virtual-device flag so it doesn't leak a different count
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        "worker failed:\n" + "\n---\n".join(o[-2000:] for o in outs))

    text = "\n".join(outs)
    dist = {int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"DISTLOSS (\d) ([\d.]+)", text)}
    single = float(re.search(r"SINGLELOSS ([\d.]+)", text).group(1))
    assert set(dist) == {0, 1}, text[-2000:]
    # replicated loss identical across hosts, and == single-process truth
    np.testing.assert_allclose(dist[0], dist[1], rtol=0, atol=0)
    np.testing.assert_allclose(dist[0], single, rtol=1e-6)

    # multi-host checkpoint round-trip (SURVEY §5.4/P10): process-0-gated
    # save, barrier, restore on BOTH hosts, one more step — the worker
    # asserts restored == in-memory continuation bit-for-bit; here we
    # assert both hosts took the step and agree exactly
    ckpt = {int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"CKPTLOSS (\d) ([-+.\deE]+)", text)}
    assert set(ckpt) == {0, 1}, text[-2000:]
    np.testing.assert_allclose(ckpt[0], ckpt[1], rtol=0, atol=0)
