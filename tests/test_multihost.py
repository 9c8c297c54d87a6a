"""True multi-process (2-host simulation) verification of the DCN wiring.

Round-1 verdict: `parallel/distributed.py` + per-host loader shards existed but
were only single-process-tested — "a claim with no multi-process test is not
yet a capability". This test spawns TWO real OS processes, each with 2 virtual
CPU devices, joined by `jax.distributed.initialize` over localhost into one
4-device global mesh, and runs the REAL ProtoOnlineAdapter (bootstrap + one
fused adaptation step) with each process feeding only its host-local shard of
every global batch. Both processes must report the identical global loss,
prototype state, and updated parameters.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_step():
    port = _free_port()
    env = dict(os.environ)
    # the worker sets its own JAX env; scrub pytest's single-process settings
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
            cwd=ROOT,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=1500)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for p in procs:
            p.communicate()
        pytest.fail("multi-host workers timed out (collective deadlock?)")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"

    records = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert {r["pid"] for r in records} == {0, 1}
    for r in records:
        assert r["nproc"] == 2 and r["ndev"] == 4

    r0, r1 = sorted(records, key=lambda r: r["pid"])
    # global quantities: bitwise-identical programs over identical global data
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["proto_sum"] == pytest.approx(r1["proto_sum"], rel=1e-6)
    assert r0["param_sum"] == pytest.approx(r1["param_sum"], rel=1e-6)
