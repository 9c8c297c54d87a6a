"""The complete adaptation state as one pytree.

The reference spreads this across four nn.Module replicas, an optimizer, pickles
and python-object monitors (reference methods/prototypes.py:43-97); here it is a
single `flax.struct` dataclass that the jitted step threads through — which also
makes exact checkpoint/resume trivial (the reference cannot resume exactly:
optimizer state, EMA/dynamic models, monitor windows are never saved, SURVEY.md
§5.4 — ours saves everything).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.monitor import MonitorState
from ..ops.prototypes import ProtoState

# switch states (reference prototypes_vswitch.py:5-26, prototypes_hybrid_switch.py:5-34)
STATIC, DYNAMIC = 0, 1


@flax.struct.dataclass
class SwitchState:
    current: jnp.ndarray      # () int32 — selected teacher
    current_dev: jnp.ndarray  # () int32 — derivative-machine memory (hybrid)


@flax.struct.dataclass
class AdaptState:
    # student (trained), reference "model"
    params: Any
    batch_stats: Any
    alt_batch_stats: Any          # second BN-stat set for the "double" policy
    opt_momentum: Any
    # teachers
    ema_params: Any               # EMA of student params; stats mirror student's
    static_params: Any            # frozen source model
    static_batch_stats: Any
    dynamic_params: Any           # periodically refreshed copy of student
    dynamic_batch_stats: Any
    # method state
    proto: ProtoState
    monitor: MonitorState
    switch: SwitchState
    rng: jax.Array                # dropout PRNG
    step: jnp.ndarray             # () int32 global step


def init_switch() -> SwitchState:
    return SwitchState(
        current=jnp.asarray(STATIC, jnp.int32), current_dev=jnp.asarray(STATIC, jnp.int32)
    )


def make_adapt_state(variables: dict, proto: ProtoState, monitor: MonitorState, seed: int,
                     bn_momentum_static: float | None = None) -> AdaptState:
    """Replicate the freshly-loaded source model into all four roles
    (reference prototypes.py:45-48: ema/dynamic/static = deepcopy(model))."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    copy = lambda tree: jax.tree.map(jnp.array, tree)
    return AdaptState(
        params=params,
        batch_stats=stats,
        alt_batch_stats=copy(stats),
        opt_momentum=jax.tree.map(jnp.zeros_like, params),
        ema_params=copy(params),
        static_params=copy(params),
        static_batch_stats=copy(stats),
        dynamic_params=copy(params),
        dynamic_batch_stats=copy(stats),
        proto=proto,
        monitor=monitor,
        switch=init_switch(),
        rng=jax.random.key(seed),
        step=jnp.zeros((), jnp.int32),
    )
