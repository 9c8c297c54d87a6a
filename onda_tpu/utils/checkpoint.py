"""Checkpoint / exact resume of the full adaptation state.

The reference saves only the student state_dict + per-domain prototype pickles
(reference methods/adaptation_model.py:202-216, prototypes.py:124-126); optimizer
state, the EMA/static/dynamic teachers, monitor windows and switch state are lost,
so resume is approximate (SURVEY.md §5.4). Here the whole `AdaptState` pytree is
one orbax checkpoint → resume is exact.
"""

from __future__ import annotations

import atexit
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

# one live checkpointer per target path for async saves (OTHERS.ASYNC_SAVE):
# orbax snapshots device arrays to host synchronously inside save() — safe
# even though the caller's state is donated into the next step — and writes
# to disk in the background, overlapping the online loop
_async_ckptrs: dict[str, ocp.StandardCheckpointer] = {}


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write has finalized.

    Runners MUST call this before the interpreter begins shutdown (train_ouda
    drains in a finally around main): threading._shutdown disables the
    concurrent.futures executors orbax's background write relies on BEFORE
    module atexit hooks run, so a write still in flight at atexit time is
    already lost."""
    for ckptr in _async_ckptrs.values():
        ckptr.wait_until_finished()


def _atexit_warn_unfinished() -> None:
    # best-effort: by now an unfinished write has already failed (see
    # wait_for_saves docstring) — surface it clearly instead of a traceback
    try:
        wait_for_saves()
    except Exception as exc:  # noqa: BLE001
        print(
            "WARNING: an async checkpoint write did not complete before "
            f"interpreter shutdown and was lost ({type(exc).__name__}). "
            "Call onda_tpu.utils.checkpoint.wait_for_saves() before exiting.",
            flush=True,
        )


atexit.register(_atexit_warn_unfinished)


def save_state(state, directory: str, name: str = "adapt_state",
               wait: bool = True) -> str:
    """Save the full state pytree. `wait=False` returns as soon as the device
    arrays are snapshot to host; the disk write proceeds in the background (at
    most one in-flight write per path — a new save waits for the previous)."""
    path = os.path.abspath(os.path.join(directory, name))
    # orbax can't serialize typed PRNG keys: expose raw key data
    state = jax.tree.map(
        lambda x: jax.random.key_data(x) if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key) else x,
        state,
        is_leaf=lambda x: hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key),
    )
    if wait:
        # a synchronous save must not race an earlier async write to the same
        # path (two writers renaming into one target directory)
        if path in _async_ckptrs:
            _async_ckptrs[path].wait_until_finished()
        ckptr = ocp.StandardCheckpointer()
    else:
        ckptr = _async_ckptrs.setdefault(path, ocp.StandardCheckpointer())
        ckptr.wait_until_finished()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def load_raw(directory: str, name: str):
    """Template-free restore: the checkpoint's own metadata provides the tree.

    Returns the saved pytree as nested dicts of host arrays (flax struct
    dataclasses come back as dicts keyed by field name). Used to lift a
    sub-tree (e.g. the student params out of an `advent_state`) into a runner
    that does not know the full saved state's structure."""
    path = os.path.abspath(os.path.join(directory, name))
    if path in _async_ckptrs:  # don't read a checkpoint still being written
        _async_ckptrs[path].wait_until_finished()
    return ocp.StandardCheckpointer().restore(path)


def load_state(template, directory: str, name: str = "adapt_state"):
    path = os.path.abspath(os.path.join(directory, name))
    if path in _async_ckptrs:  # don't read a checkpoint still being written
        _async_ckptrs[path].wait_until_finished()
    raw_template = jax.tree.map(
        lambda x: jax.random.key_data(x) if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key) else x,
        template,
        is_leaf=lambda x: hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key),
    )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, raw_template)
    # re-wrap PRNG key leaves
    def rewrap(tmpl, val):
        if hasattr(tmpl, "dtype") and jax.dtypes.issubdtype(tmpl.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(np.asarray(val))
        return val

    return jax.tree.map(
        rewrap,
        template,
        restored,
        is_leaf=lambda x: hasattr(x, "dtype") and jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key),
    )
