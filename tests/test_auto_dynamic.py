"""AUTO_DYNAMIC scripted-trace oracle (round-2 verdict next-round item 4).

The reference's `evaluate_update_dynamic` (reference prototypes.py:396-405)
and our host-side `_maybe_update_dynamic` (onda_tpu/methods/proto_online.py)
are driven with IDENTICAL scripted dev-avg traces; the dynamic-teacher refresh
steps must match exactly. Semantics pinned by the trace:

  * the counter increments every step, and the derivative is consulted only
    STRICTLY past the patience threshold (`> 500`, not `>=`);
  * a past-patience step whose |dev| does not exceed DEV_THRESH neither fires
    nor resets the counter — the next qualifying step fires immediately;
  * |dev| must STRICTLY exceed DEV_THRESH (equality does not fire), and the
    sign is ignored (np.abs);
  * the counter resets ONLY on an actual refresh.
"""

import pytest

from onda_tpu.config import default_config
from onda_tpu.methods.proto_online import ProtoOnlineAdapter

from .oracle import import_reference
from .torch_ref import stub_cuda_events, stub_wandb

PATIENCE = 500  # hardcoded in the reference (prototypes.py:399)
THRESH = 2e-4


def scripted_trace():
    """dev-avg per step; expected refreshes at indices 503 and 1005."""
    trace = []
    trace += [1.0] * PATIENCE            # 0..499: inside patience — huge dev ignored
    trace += [THRESH / 2, -THRESH, THRESH]  # 500..502: below / |.|==thresh — no fire
    trace += [-3e-4]                     # 503: fires (abs of a negative dev)
    trace += [1.0] * PATIENCE            # 504..1003: counter restarted — ignored
    trace += [0.0, 5e-4]                 # 1004: no; 1005: fires
    return trace


def make_spec():
    spec = default_config().METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
    spec.AUTO_DYNAMIC = True
    spec.DEV_THRESH = THRESH
    return spec


def run_reference(trace):
    """Drive the REAL reference method on a bare instance: only the attributes
    `evaluate_update_dynamic` reads are provided, `update_dynamic` records."""
    pytest.importorskip("torch")
    stub_wandb()
    stub_cuda_events()
    ref_mod = import_reference("framework.domain_adaptation.methods.prototypes")
    ref = object.__new__(ref_mod.online_proDA)
    ref.cfg_spec = make_spec()
    ref.dynamic_update_counter = 0  # reference __init__ value (prototypes.py:97)
    fired = []
    current = {"i": 0}

    class MA:  # the one Monitor call the method makes
        def dev_avg(self, name):
            assert name == "prior static"
            return trace[current["i"]]

    ref.intensity_ma = MA()
    ref.update_dynamic = lambda: fired.append(current["i"])
    for i in range(len(trace)):
        current["i"] = i
        ref.evaluate_update_dynamic()
    return fired


def run_ours(trace):
    ours = object.__new__(ProtoOnlineAdapter)
    ours.cfg_spec = make_spec()
    ours.dynamic_update_counter = 0
    ours.state = object()            # _copy_dynamic identity: no jax involved
    ours._copy_dynamic = lambda s: s
    return [i for i, dev in enumerate(trace)
            if ours._maybe_update_dynamic(lambda: dev)]


def test_auto_dynamic_refresh_steps_match_reference():
    trace = scripted_trace()
    ref_fired = run_reference(trace)
    our_fired = run_ours(trace)
    assert ref_fired == [503, 1005], ref_fired  # the trace's designed semantics
    assert our_fired == ref_fired


def test_auto_dynamic_long_noisy_trace_matches_reference():
    """Adversarial dense trace: dev values straddle the threshold pseudo-randomly
    so every fire/reset interaction is exercised, not just the designed ones."""
    import numpy as np

    rng = np.random.default_rng(11)
    trace = (rng.standard_normal(4000) * THRESH).tolist()
    ref_fired = run_reference(trace)
    our_fired = run_ours(trace)
    assert ref_fired, "trace never fired — not a meaningful comparison"
    assert our_fired == ref_fired
