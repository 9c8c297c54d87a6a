"""Lazy packed step logs.

The fused steps return their ~40 scalar diagnostics as ONE stacked f32 vector
(a single device→host transfer instead of ~40 per-key syncs — each sync costs a
full round trip on tunneled chips). `LazyLogs` defers even that one transfer
until the host actually reads a scalar, so back-to-back step calls (bench
loops, the steady-state train loop) keep the device pipeline full.
"""

from __future__ import annotations

import numpy as np


def packed_jit(step_fn, donate_argnums):
    """jit a step whose LAST return value is a dict of logs; scalars are packed
    into one f32 vector on device and unpacked lazily on the host.

    Returns a callable with the step's signature whose last return value is a
    :class:`LazyLogs`; leading return values pass through. The scalar key
    order is captured at trace time (the traced function appends it to a
    closure list before jit executes the host wrapper). Used by every fused
    step builder (proto_online, advent, proto_advent)."""
    import jax
    import jax.numpy as jnp

    capture = []

    def traced(*args):
        *lead, logs = step_fn(*args)
        keys = sorted(k for k, v in logs.items() if getattr(v, "ndim", 1) == 0)
        capture.append(keys)
        packed = jnp.stack([logs[k].astype(jnp.float32) for k in keys])
        arrays = {k: v for k, v in logs.items() if k not in keys}
        return (*lead, packed, arrays)

    jitted = jax.jit(traced, donate_argnums=donate_argnums)
    impl = [jitted]  # swapped for an AOT-deserialized Compiled by aot_warm

    def call(*args):
        *lead, packed, arrays = impl[0](*args)
        return (*lead, LazyLogs(capture[0], packed, arrays))

    def aot_warm(*args, cache_dir=None, tag="step"):
        """Install a serialized-executable fast path for these arg avals
        (utils/aot_cache.py): a warm host skips XLA compilation entirely.
        Trace-time key capture still needs one host-side trace — `lower`
        inside warm() provides it. Returns True when an executable (cached
        or fresh) was installed. Idempotent: a second call (e.g. the next
        domain's first step in the train loop) keeps the installed
        executable instead of re-tracing and re-loading."""
        if impl[0] is not jitted:
            return True
        from ..utils import aot_cache

        compiled = aot_cache.warm(jitted, args, cache_dir=cache_dir, tag=tag)
        if compiled is not None:
            impl[0] = compiled
        return compiled is not None

    call.jitted = jitted  # exposed for AOT introspection (bench.py MFU: lower→compile→cost_analysis)
    call.aot_warm = aot_warm
    return call


class LazyLogs(dict):
    """dict of {scalar log name: value} + array-valued entries.

    Array entries (e.g. soft_predictions) live in the dict from construction;
    scalar entries materialize from the packed vector on first read.
    """

    def __init__(self, keys, packed, arrays=None):
        super().__init__(arrays or {})
        self._scalar_keys = list(keys)
        self._packed = packed
        self._materialized = False

    def _materialize(self):
        if not self._materialized:
            values = np.asarray(self._packed)  # the one D2H transfer
            super().update(zip(self._scalar_keys, values))
            self._materialized = True
            self._packed = None

    def __getitem__(self, key):
        self._materialize()
        return super().__getitem__(key)

    def __contains__(self, key):
        return key in self._scalar_keys or super().__contains__(key)

    def get(self, key, default=None):
        self._materialize()
        return super().get(key, default)

    def pop(self, key, *default):
        if key not in self._scalar_keys:
            return super().pop(key, *default)
        self._materialize()
        return super().pop(key, *default)

    def keys(self):
        self._materialize()
        return super().keys()

    def items(self):
        self._materialize()
        return super().items()

    def values(self):
        self._materialize()
        return super().values()

    def __iter__(self):
        self._materialize()
        return super().__iter__()

    def __len__(self):
        self._materialize()
        return super().__len__()
