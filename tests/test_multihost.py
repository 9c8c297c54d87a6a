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
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the worker sets its own JAX env; scrub pytest's single-process settings
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    # worker stdout/stderr go to files, not PIPEs: the workers are coupled by
    # collectives, and sequential communicate() would stop draining the OTHER
    # worker's pipe — if that one fills 64 KiB of stderr before its barrier,
    # both deadlock until the timeout.
    streams = [
        (open(tmp_path / f"w{pid}.out", "w+"), open(tmp_path / f"w{pid}.err", "w+"))
        for pid in range(2)
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=streams[pid][0], stderr=streams[pid][1], env=env, text=True,
            cwd=ROOT,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        deadline = time.monotonic() + 1500
        for p in procs:
            p.wait(timeout=max(1.0, deadline - time.monotonic()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait()
        pytest.fail("multi-host workers timed out (collective deadlock?)")
    finally:
        for p, (out_f, err_f) in zip(procs, streams):
            out_f.seek(0)
            err_f.seek(0)
            outs.append((p.returncode, out_f.read(), err_f.read()))
            out_f.close()
            err_f.close()

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
