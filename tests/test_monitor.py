"""Golden tests: jittable Monitor vs the reference sliding-window monitor.

The whole add/read trajectory runs as one jitted lax.scan (single compile); the
reference is driven step-by-step on host and trajectories are compared.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from onda_tpu.ops.monitor import Monitor

from .oracle import import_reference

LIMIT = 12
KEYS = ("a", "b")


def make_run(dev_func):
    mon = Monitor(KEYS, limit=LIMIT, exp_const=0.05, dev_func=dev_func)

    @jax.jit
    def run(vals, add_b_mask):
        def step(state, xv):
            v, add_b = xv
            state = mon.add(state, "a", v)
            state = mon.add(state, "b", v * 2, enable=add_b)
            outs = jnp.stack(
                [
                    mon.avg(state, "a"), mon.exp_avg(state, "a"), mon.dev_avg(state, "a"),
                    mon.avg(state, "b"), mon.exp_avg(state, "b"), mon.dev_avg(state, "b"),
                ]
            )
            return state, outs

        return lax.scan(step, mon.init(), (vals, add_b_mask))[1]

    return mon, run


@pytest.fixture
def ref_monitor_cls():
    return import_reference("framework.utils.monitoring").Monitor


@pytest.mark.parametrize("dev_func", ["hamming", "mean", "median"])
def test_monitor_matches_reference(ref_monitor_cls, dev_func, rng):
    _, run = make_run(dev_func)
    vals = rng.random(40).astype(np.float32)
    add_b = (np.arange(40) % 3 == 0)
    got = np.asarray(run(jnp.asarray(vals), jnp.asarray(add_b)))

    ref = ref_monitor_cls(limit=LIMIT, exp_const=0.05, dev_func=dev_func)
    for i, v in enumerate(vals):
        v = float(v)
        ref.add({"a": v})
        if add_b[i]:
            ref.add({"b": v * 2})
        want = [
            ref.avg("a"), ref.exp("a"), ref._dev_avg("a"),
            ref.avg("b"), ref.exp("b"), ref._dev_avg("b"),
        ]
        np.testing.assert_allclose(got[i], np.asarray(want, np.float64), atol=1e-5)


def test_never_added_key_defaults(ref_monitor_cls):
    mon, run = make_run("hamming")
    got = np.asarray(run(jnp.zeros(1), jnp.zeros(1, bool)))
    ref = ref_monitor_cls(limit=LIMIT)
    ref.add({"a": 0.0})
    # key "b" never added → avg 1, exp 1, dev 0 (reference monitoring.py:75-89,64-66)
    assert got[0][3] == ref.avg("b") == 1
    assert got[0][4] == ref.exp("b") == 1
    assert got[0][5] == ref._dev_avg("b") == 0


def test_freeze_blocks_adds():
    mon, run = make_run("hamming")
    vals = jnp.asarray(np.full(5, 0.5, np.float32))
    frozen_mask = jnp.asarray([True, True, True, False, False])
    got = np.asarray(run(vals, frozen_mask))
    # "b" stops receiving at step 3 → its stats freeze at the step-2 values
    np.testing.assert_allclose(got[4][3:5], got[2][3:5])
