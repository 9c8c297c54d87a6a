"""Teacher-switching policies as pure traced functions.

The reference implements each policy as a subclass overriding
`prototype_predictions` (SURVEY.md §2.5-2.6); here a policy is a function that,
given monitor/switch state and the (already computed) EMA/static priors, decides
whether to run the dynamic teacher (a `lax.cond`-wrapped forward — the skipped
branch costs nothing, matching the reference's "skip the forward" behavior) and
how to mix the prior:

* base   — PROTO_ONLINE: below SWITCH_PRIOR_THRESH the prior is *replaced* by the
           dynamic prediction; above it the dynamic forward is skipped
           (reference methods/prototypes.py:227-248)
* hswitch — confidence switch (+SOFT_TRANS linear ramp); *mixes* by
           percentage_static (reference prototypes_hswitch.py:45-68)
* vswitch — 2-state machine on the derivative of the static-confidence MA;
           *replaces* when dynamic (reference prototypes_vswitch.py:20-70)
* hybrid  — absolute confidence outside GRAY_AREA decides, derivative state
           inside it; *replaces* when dynamic (reference
           prototypes_hybrid_switch.py:22-34,66-84)

All decisions are scalar comparisons on monitor statistics — trivially traceable.
Each returns (prior, dyn_probs, dyn_computed, switch_state, extra_logs).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import value_or
from .state import DYNAMIC, STATIC, SwitchState


def _gated_dynamic(dyn_forward, compute, template):
    """Run the dynamic teacher only when `compute` is true (lax.cond skips it)."""
    return lax.cond(compute, dyn_forward, lambda: jnp.zeros_like(template))


def compute_prior(
    policy: str,
    spec,
    monitor,
    mon_state,
    switch: SwitchState,
    prior_ema,
    prior_static,
    dyn_forward,
    frozen,
):
    """Assemble the teacher prior. `spec` is the method cfg block (static floats).

    prior_ema/prior_static: (B, h, w, C) probabilities (prior_static is None when
    STATIC_LAMBDA == 0 and its forward was skipped at trace time).
    `frozen` gates switch-state mutation (reference freezes switches during eval,
    prototypes_hybrid_switch.py:103-109).
    """
    ema_l = float(spec.EMA_LAMBDA)
    static_l = float(spec.STATIC_LAMBDA)
    dyn_l = float(spec.DYNAMIC_LAMBDA)
    base_prior = ema_l * prior_ema
    if prior_static is not None:
        base_prior = base_prior + static_l * prior_static
    logs = {}

    avg_static = monitor.avg(mon_state, "prior static")
    dev_static = monitor.dev_avg(mon_state, "prior static")

    if policy == "base":
        thresh = float(value_or(spec.SWITCH_PRIOR_THRESH, 0.0))
        if thresh > 0:
            replace = avg_static < thresh
            calc_dyn = replace
        else:
            replace = jnp.asarray(False)
            calc_dyn = jnp.asarray(True)
        if dyn_l > 0:
            dyn_p = _gated_dynamic(dyn_forward, calc_dyn, prior_ema)
            mixed = base_prior + dyn_l * dyn_p  # dyn_p is 0 when skipped
            prior = jnp.where(replace, dyn_l * dyn_p, mixed)
        else:
            dyn_p, calc_dyn, prior = jnp.zeros_like(prior_ema), jnp.asarray(False), base_prior
        return prior, dyn_p, calc_dyn, switch, logs

    if policy == "hswitch":
        if value_or(spec.SOFT_TRANS, False):
            # linear ramp 0→1 over ~[0.82, 0.90] (reference prototypes_hswitch.py:47-48)
            ps = jnp.clip(avg_static * (25.0 / 3.0) - (41.0 / 6.0), 0.0, 1.0)
        else:
            ps = (avg_static > float(value_or(spec.SWITCH_PRIOR_THRESH, 0.86))).astype(jnp.float32)
        logs["percentage_static"] = ps
        calc_dyn = jnp.logical_and(dyn_l > 0, ps < 1.0)
        dyn_p = _gated_dynamic(dyn_forward, calc_dyn, prior_ema)
        prior = base_prior * ps + (1.0 - ps) * dyn_l * dyn_p
        return prior, dyn_p, calc_dyn, switch, logs

    if policy == "vswitch":
        # the vswitch reuses SWITCH_PRIOR_THRESH as its derivative threshold
        # (reference prototypes_vswitch.py:32-34; class default 0.00028)
        thr = float(value_or(spec.SWITCH_PRIOR_THRESH, 0.00028))
        new_current = jnp.where(
            dev_static > thr,
            STATIC,
            jnp.where(dev_static < -thr, DYNAMIC, switch.current),
        ).astype(jnp.int32)
        current = jnp.where(frozen, switch.current, new_current)
        switch = switch.replace(current=current)
        calc_dyn = jnp.logical_and(current == DYNAMIC, dyn_l > 0)
        dyn_p = _gated_dynamic(dyn_forward, calc_dyn, prior_ema)
        prior = jnp.where(calc_dyn, dyn_l * dyn_p, base_prior)
        return prior, dyn_p, calc_dyn, switch, logs

    if policy == "hybrid":
        if spec.EXP_PR_STATIC != {} and spec.EXP_PR_STATIC:
            conf = monitor.exp_avg(mon_state, "prior static")
        else:
            conf = avg_static
        lo, hi = (float(v) for v in value_or(spec.GRAY_AREA, (0.84, 0.88)))
        dev_thr = float(value_or(spec.DEV_THRESH, 0.0002))
        new_dev = jnp.where(
            dev_static > dev_thr,
            STATIC,
            jnp.where(dev_static < -dev_thr, DYNAMIC, switch.current_dev),
        ).astype(jnp.int32)
        new_current = jnp.where(
            conf < lo, DYNAMIC, jnp.where(conf > hi, STATIC, new_dev)
        ).astype(jnp.int32)
        current_dev = jnp.where(frozen, switch.current_dev, new_dev)
        current = jnp.where(frozen, switch.current, new_current)
        switch = switch.replace(current=current, current_dev=current_dev)
        calc_dyn = jnp.logical_and(current == DYNAMIC, dyn_l > 0)
        dyn_p = _gated_dynamic(dyn_forward, calc_dyn, prior_ema)
        prior = jnp.where(calc_dyn, dyn_l * dyn_p, base_prior)
        return prior, dyn_p, calc_dyn, switch, logs

    raise ValueError(f"unknown prior policy {policy!r}")


POLICY_BY_METHOD = {
    "PROTO_ONLINE": "base",
    "PROTO_ONLINE_HSWITCH": "hswitch",
    "PROTO_ONLINE_VSWITCH": "vswitch",
    "PROTO_ONLINE_HYBRIDSWITCH": "hybrid",
    "PROTO_ADVENT": "hswitch",  # adv_proDA composes an hswitch (reference prototype_advent.py:14-17)
}
