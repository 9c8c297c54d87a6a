"""Multi-chip sharding: the full adaptation step over a virtual 8-device mesh."""

import numpy as np
import pytest
import jax


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA flags)")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_is_traceable():
    """entry()'s forward must trace (abstract eval) without executing."""
    import __graft_entry__ as ge
    import jax.numpy as jnp

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    logits, feat = out
    assert logits.shape == (4, 65, 129, 19)
    assert feat.shape == (4, 65, 129, 256)
