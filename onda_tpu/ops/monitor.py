"""Sliding-window confidence monitor as a jittable state machine.

Reimplements the reference `Monitor` (framework/utils/monitoring.py:7-96) — the
component that powers every teacher-switching policy — as fixed-shape ring buffers
inside the jitted step:

* ``avg``  = **median** of the current window (reference monitoring.py:83-93);
  returns 1 for a key that has never been added.
* ``exp``  = exponential moving average with constant ``exp_const``
  (reference monitoring.py:41-54,75-81); returns 1 before the first add.
* ``dev_avg`` = one-step derivative of a windowed mean over the last ``limit``
  values, window function hamming | median | mean; returns 0 until the window is
  full (reference monitoring.py:56-73).
* freezing during evaluation (``monitor.eval()``) maps to passing ``enable=False``
  to ``add`` — reads stay available while frozen.

Keys are a static tuple; every array has shape (K, limit) so the whole monitor is
one small pytree living in the adaptation state.
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class MonitorState:
    ring: jnp.ndarray   # (K, W) recorded values, ring order
    count: jnp.ndarray  # (K,)  total adds, saturating at W
    ptr: jnp.ndarray    # (K,)  next write slot
    exp: jnp.ndarray    # (K,)  exponential moving average
    started: jnp.ndarray  # (K,) bool — key has been added at least once


def _median_of_first_n(sorted_vals: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Median of the first `n` entries of an ascending-sorted vector (n >= 1)."""
    lo = sorted_vals[jnp.maximum((n - 1) // 2, 0)]
    hi = sorted_vals[jnp.maximum(n // 2, 0)]
    return (lo + hi) / 2.0


class Monitor:
    """Static definition (keys, window size, window function) + pure state ops."""

    def __init__(
        self,
        keys: Sequence[str],
        limit: int = 200,
        exp_const: float = 0.01,
        dev_func: str = "hamming",
    ):
        self.keys = tuple(keys)
        self.index = {k: i for i, k in enumerate(self.keys)}
        self.limit = int(limit)
        self.exp_const = float(exp_const)
        self.dev_func = dev_func
        # hamming window over limit-1 samples (reference monitoring.py:24-25)
        sig = np.hamming(self.limit - 1)
        self._signal = jnp.asarray(sig, jnp.float32)
        self._signal_sum = float(sig.sum())

    def init(self) -> MonitorState:
        k, w = len(self.keys), self.limit
        return MonitorState(
            ring=jnp.zeros((k, w), jnp.float32),
            count=jnp.zeros((k,), jnp.int32),
            ptr=jnp.zeros((k,), jnp.int32),
            exp=jnp.ones((k,), jnp.float32),
            started=jnp.zeros((k,), bool),
        )

    # --- updates ----------------------------------------------------------
    def add(self, state: MonitorState, key: str, value, enable=True) -> MonitorState:
        """Record `value` under `key`; no-op when `enable` is False (frozen)."""
        i = self.index[key]
        value = jnp.asarray(value, jnp.float32)
        enable = jnp.asarray(enable, bool)
        ptr = state.ptr[i]
        new_ring_row = state.ring[i].at[ptr].set(value)
        ring = state.ring.at[i].set(jnp.where(enable, new_ring_row, state.ring[i]))
        count = state.count.at[i].set(
            jnp.where(enable, jnp.minimum(state.count[i] + 1, self.limit), state.count[i])
        )
        new_ptr = jnp.where(enable, (ptr + 1) % self.limit, ptr)
        # exp: first add sets the value directly (reference monitoring.py:45-47)
        new_exp = jnp.where(
            state.started[i],
            (1.0 - self.exp_const) * state.exp[i] + self.exp_const * value,
            value,
        )
        exp = state.exp.at[i].set(jnp.where(enable, new_exp, state.exp[i]))
        started = state.started.at[i].set(state.started[i] | enable)
        return state.replace(
            ring=ring, count=count, ptr=state.ptr.at[i].set(new_ptr), exp=exp, started=started
        )

    # --- reads ------------------------------------------------------------
    def avg(self, state: MonitorState, key: str) -> jnp.ndarray:
        """Median of the window; 1 if never added (reference monitoring.py:83-89)."""
        i = self.index[key]
        n = state.count[i]
        padded = jnp.where(
            jnp.arange(self.limit) < n,
            # move valid entries to the front in any order: ring slots [0, n) hold
            # the live window whenever n < limit (ptr wraps only at full window),
            # and at full window every slot is live.
            state.ring[i],
            jnp.inf,
        )
        med = _median_of_first_n(jnp.sort(padded), n)
        return jnp.where(n > 0, med, 1.0)

    def exp_avg(self, state: MonitorState, key: str) -> jnp.ndarray:
        i = self.index[key]
        return jnp.where(state.started[i], state.exp[i], 1.0)

    def _chronological(self, state: MonitorState, i: int) -> jnp.ndarray:
        """Window in insertion order (valid only when the window is full)."""
        return jnp.roll(state.ring[i], -state.ptr[i], axis=0)

    def _window_mean(self, vals: jnp.ndarray) -> jnp.ndarray:
        """Window function over limit-1 chronological samples (reference monitoring.py:26-33)."""
        if self.dev_func == "hamming":
            return (self._signal * vals).sum() / self._signal_sum
        if self.dev_func == "mean":
            return vals.mean()
        if self.dev_func == "median":
            return jnp.median(vals)
        raise ValueError(self.dev_func)

    def dev_avg(self, state: MonitorState, key: str) -> jnp.ndarray:
        """Derivative of the windowed mean; 0 until the window fills
        (reference monitoring.py:64-73)."""
        i = self.index[key]
        chron = self._chronological(state, i)
        end = self._window_mean(chron[1:])
        start = self._window_mean(chron[:-1])
        return jnp.where(state.count[i] >= self.limit, end - start, 0.0)

    # --- logging helpers --------------------------------------------------
    def avg_all(self, state: MonitorState) -> dict:
        return {k: self.avg(state, k) for k in self.keys}

    def exp_all(self, state: MonitorState) -> dict:
        return {k: self.exp_avg(state, k) for k in self.keys}


def scale_predictions(prediction_matrix, scale_from, scale_to):
    """Confidence rescaling helper (reference monitoring.py:163-167):
    affine remap of class probabilities so a confidence of `scale_from` maps to
    `scale_to`, anchored at the uniform 1/C point."""
    classes = prediction_matrix.shape[-1]
    classes_inv = 1.0 / classes
    multi_constant = (scale_to - classes_inv) / (scale_from - classes_inv)
    return (prediction_matrix - classes_inv) * multi_constant + classes_inv
