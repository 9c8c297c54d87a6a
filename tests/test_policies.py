"""Switch-policy state machines driven by scripted confidence traces (SURVEY.md §4).

The reference policy classes live in modules that import wandb (absent here), so
the oracles are inline re-statements of their documented behavior:
* vswitch model_select — reference prototypes_vswitch.py:5-26
* hybrid model_select  — reference prototypes_hybrid_switch.py:5-34
* hswitch soft ramp    — reference prototypes_hswitch.py:45-53
"""

import numpy as np
import jax
import jax.numpy as jnp

from onda_tpu.config import Config
from onda_tpu.methods.prior_policy import compute_prior
from onda_tpu.methods.state import DYNAMIC, STATIC, init_switch
from onda_tpu.ops.monitor import Monitor

B, H, W, C = 1, 2, 2, 4
KEYS = ("prior static",)


def spec_for(policy):
    spec = Config()
    spec.EMA_LAMBDA = 0.0
    spec.STATIC_LAMBDA = 1.0
    spec.DYNAMIC_LAMBDA = 1.0
    spec.SWITCH_PRIOR_THRESH = 0.86
    spec.SOFT_TRANS = policy == "hswitch_soft"
    spec.GRAY_AREA = [0.83, 0.9]
    spec.DEV_THRESH = 0.0002
    return spec


def run_policy(policy, spec, static_trace, dev_window=4):
    """Feed a static-confidence trace; return per-step (dyn_computed, switch.current)."""
    mon = Monitor(KEYS, limit=dev_window)
    prior_ema = jnp.zeros((B, H, W, C))
    prior_static = jnp.full((B, H, W, C), 1.0 / C)
    dyn_val = jnp.full((B, H, W, C), 0.5)

    @jax.jit
    def trajectory(vals):
        def step(carry, v):
            mstate, sw = carry
            mstate = mon.add(mstate, "prior static", v)
            prior, dyn_p, calc, sw, _ = compute_prior(
                policy, spec, mon, mstate, sw, prior_ema, prior_static,
                lambda: dyn_val, frozen=jnp.asarray(False),
            )
            return (mstate, sw), (calc, sw.current, prior[0, 0, 0, 0])

        return jax.lax.scan(step, (mon.init(), init_switch()), vals)[1]

    calc, current, p0 = trajectory(jnp.asarray(static_trace, jnp.float32))
    return np.asarray(calc), np.asarray(current), np.asarray(p0)


def test_base_policy_replace_below_thresh():
    spec = spec_for("base")
    # median above thresh → dynamic skipped; below → prior replaced by dynamic
    calc, _, p0 = run_policy("base", spec, [0.95, 0.95, 0.95, 0.5, 0.5, 0.5, 0.5])
    assert not calc[:3].any()           # confident: skip dynamic forward
    assert calc[-1]                     # median now 0.5 < 0.86 → compute + replace
    assert np.isclose(p0[-1], 0.5)      # prior replaced by DYNAMIC_LAMBDA * dyn (0.5)
    assert np.isclose(p0[0], 0.25)      # static prior survives when confident


def test_base_policy_thresh_zero_always_mixes():
    spec = spec_for("base")
    spec.SWITCH_PRIOR_THRESH = 0
    calc, _, p0 = run_policy("base", spec, [0.95, 0.5])
    assert calc.all()                   # dynamic always computed (dynamic_model.yml)
    assert np.allclose(p0, 0.75)        # mixed: static 0.25 + dyn 0.5


def test_hswitch_hard_and_soft():
    spec = spec_for("hswitch")
    calc, _, p0 = run_policy("hswitch", spec, [0.95, 0.95, 0.5, 0.5, 0.5])
    assert not calc[0] and calc[-1]
    # soft ramp: percentage_static = clip(v*25/3 - 41/6, 0, 1) (reference :47-48)
    spec = spec_for("hswitch_soft")
    calc, _, p0 = run_policy("hswitch", spec, [0.86, 0.86])
    ps = np.clip(0.86 * 25 / 3 - 41 / 6, 0, 1)
    want = ps * 0.25 + (1 - ps) * 0.5
    assert calc.all() and np.allclose(p0, want, atol=1e-5)


def test_vswitch_derivative_state_machine():
    spec = spec_for("vswitch")
    spec.SWITCH_PRIOR_THRESH = 0.01  # dev threshold for this policy
    window = 4
    # rising trace: dev > +θ → static; then falling: dev < -θ → dynamic
    trace = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]
    calc, current, p0 = run_policy("vswitch", spec, trace, dev_window=window)
    assert current[0] == STATIC          # starts static
    assert (current[window:6] == STATIC).all()
    assert current[-1] == DYNAMIC        # falling confidence flips to dynamic
    assert np.isclose(p0[-1], 0.5)       # replaced by dynamic prior


def test_hybrid_gray_area():
    spec = spec_for("hybrid")
    window = 4
    # confident: above hi → static; collapse below lo → dynamic regardless of dev
    trace = [0.95] * 5 + [0.5] * 4
    calc, current, _ = run_policy("hybrid", spec, trace, dev_window=window)
    assert (current[:5] == STATIC).all()
    assert current[-1] == DYNAMIC
    # inside gray area the derivative state decides: falling dev → dynamic
    trace = [0.95, 0.92, 0.89, 0.87, 0.86, 0.85, 0.85]
    _, current, _ = run_policy("hybrid", spec, trace, dev_window=window)
    assert current[-1] == DYNAMIC
