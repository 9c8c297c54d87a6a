"""Switch-policy state machines driven by scripted confidence traces (SURVEY.md §4).

Two layers of oracle:
* quick behavioral checks against re-stated rules (readable, pinpoint failures);
* REFERENCE-CLASS oracles (`test_ref_*` below): the real `model_select` machines
  from prototypes_vswitch.py:5-26 / prototypes_hybrid_switch.py:5-34 and the
  real `framework.utils.monitoring.Monitor`, driven step-by-step on random
  confidence walks (wandb stubbed via tests/torch_ref.py), must produce the
  identical decision sequence as our jitted compute_prior on the same trace.
  (Full-step composition parity lives in tests/test_ref_step_parity.py.)
"""

import numpy as np
import pytest
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


# ---------------------------------------------------------------------------
# reference-class oracles: the REAL switch machines on random confidence walks
# ---------------------------------------------------------------------------

def _random_walk(seed, n=16):
    """A confidence trace with rises, falls and plateaus, on a 0.01 grid (grid
    values keep f32-vs-f64 monitor statistics away from threshold boundaries)."""
    rng = np.random.default_rng(seed)
    v = 0.85
    out = []
    for _ in range(n):
        v = float(np.clip(v + rng.choice([-0.03, -0.01, 0.0, 0.01, 0.03]), 0.5, 0.99))
        out.append(round(v, 2))
    return out


def _ref_decisions(policy, trace, window, *, thresh=None, gray=None,
                   dev_thr=None, use_exp=False):
    """Drive the reference's own classes exactly as its prototype_predictions
    does: monitor.add → model_select.evaluate (prototypes_vswitch.py:36-70,
    prototypes_hybrid_switch.py:44-84, prototypes.py:228-239)."""
    from .oracle import import_reference
    from .torch_ref import stub_cuda_events, stub_wandb

    stub_wandb()
    stub_cuda_events()
    mon = import_reference("framework.utils.monitoring").Monitor(limit=window)
    out = []
    if policy == "vswitch":
        cls = import_reference(
            "framework.domain_adaptation.methods.prototypes_vswitch").model_select
        ms = cls(cls.static, thresh)
        for v in trace:
            mon.add({"prior static": v})
            ms.evaluate(mon.dev_avg("prior static"))
            out.append(ms.current)
    elif policy == "hybrid":
        cls = import_reference(
            "framework.domain_adaptation.methods.prototypes_hybrid_switch").model_select
        ms = cls(cls.static, tuple(gray), dev_thr)
        for v in trace:
            mon.add({"prior static": v})
            conf = mon.exp("prior static") if use_exp else mon.avg("prior static")
            ms.evaluate(conf, mon.dev_avg("prior static"))
            out.append(ms.current)
    else:  # base mixing rule, reference prototypes.py:228-239
        for v in trace:
            mon.add({"prior static": v})
            replace = thresh > 0 and mon.avg("prior static") < thresh
            calc = not (thresh > 0 and not replace)
            out.append((bool(calc), bool(replace)))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("window", [4, 6])
def test_ref_vswitch_decisions_match(seed, window):
    thresh = 0.003
    trace = _random_walk(seed)
    want = _ref_decisions("vswitch", trace, window, thresh=thresh)
    spec = spec_for("vswitch")
    spec.SWITCH_PRIOR_THRESH = thresh
    _, current, _ = run_policy("vswitch", spec, trace, dev_window=window)
    assert list(current) == want, (trace, list(current), want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("use_exp", [False, True])
def test_ref_hybrid_decisions_match(seed, use_exp):
    window, gray, dev_thr = 5, (0.83, 0.9), 0.003
    trace = _random_walk(seed)
    want = _ref_decisions("hybrid", trace, window, gray=gray, dev_thr=dev_thr,
                          use_exp=use_exp)
    spec = spec_for("hybrid")
    spec.GRAY_AREA = list(gray)
    spec.DEV_THRESH = dev_thr
    spec.EXP_PR_STATIC = use_exp
    _, current, _ = run_policy("hybrid", spec, trace, dev_window=window)
    assert list(current) == want, (trace, list(current), want)


@pytest.mark.parametrize("seed", [0, 1])
def test_ref_base_mixing_rule_matches(seed):
    thresh, window = 0.86, 4
    trace = _random_walk(seed)
    want = _ref_decisions("base", trace, window, thresh=thresh)
    spec = spec_for("base")
    spec.SWITCH_PRIOR_THRESH = thresh
    calc, _, p0 = run_policy("base", spec, trace, dev_window=window)
    got = [(bool(c), bool(np.isclose(p, 0.5))) for c, p in zip(calc, p0)]
    assert got == want, (trace, got, want)
