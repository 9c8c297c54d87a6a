"""Checkpoint / exact resume of the full adaptation state.

The reference saves only the student state_dict + per-domain prototype pickles
(reference methods/adaptation_model.py:202-216, prototypes.py:124-126); optimizer
state, the EMA/static/dynamic teachers, monitor windows and switch state are lost,
so resume is approximate (SURVEY.md §5.4). Here the whole `AdaptState` pytree is
one orbax checkpoint → resume is exact.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_state(state, directory: str, name: str = "adapt_state") -> str:
    path = os.path.abspath(os.path.join(directory, name))
    # orbax can't serialize typed PRNG keys: expose raw key data
    state = jax.tree.map(
        lambda x: jax.random.key_data(x) if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key) else x,
        state,
        is_leaf=lambda x: hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key),
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_raw(directory: str, name: str):
    """Template-free restore: the checkpoint's own metadata provides the tree.

    Returns the saved pytree as nested dicts of host arrays (flax struct
    dataclasses come back as dicts keyed by field name). Used to lift a
    sub-tree (e.g. the student params out of an `advent_state`) into a runner
    that does not know the full saved state's structure."""
    path = os.path.abspath(os.path.join(directory, name))
    return ocp.StandardCheckpointer().restore(path)


def load_state(template, directory: str, name: str = "adapt_state"):
    path = os.path.abspath(os.path.join(directory, name))
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
