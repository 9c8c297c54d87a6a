"""packed_jit / LazyLogs: the one-packed-D2H step-log contract.

Every fused step builder (proto_online, advent, proto_advent) routes its ~40
scalar diagnostics through `logs_util.packed_jit`; these tests pin the
contract directly: scalars pack into one f32 vector, array-valued entries pass
through untouched, leading return values keep their identity, and donation
still applies to the wrapped jit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from onda_tpu.methods.logs_util import LazyLogs, packed_jit


def _step(state, x):
    new_state = state + x.sum()
    logs = {
        "b scalar": x.mean(),
        "a scalar": x.sum(),
        "soft_predictions": x * 2,  # array-valued: must NOT be packed
        "c int scalar": jnp.asarray(3, jnp.int32),
    }
    return new_state, logs


def test_packed_jit_scalars_and_arrays():
    call = packed_jit(_step, donate_argnums=())
    state = jnp.asarray(1.0)
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    new_state, logs = call(state, x)
    assert isinstance(logs, LazyLogs)
    assert float(new_state) == 1.0 + 15.0
    # scalar entries materialize from the packed vector, cast to f32
    assert logs["a scalar"] == 15.0
    assert logs["b scalar"] == 2.5
    assert logs["c int scalar"] == 3.0
    # array-valued entries keep shape and values
    np.testing.assert_allclose(np.asarray(logs["soft_predictions"]), np.asarray(x) * 2)
    assert set(logs.keys()) == {"a scalar", "b scalar", "c int scalar", "soft_predictions"}


def test_packed_jit_laziness():
    """No D2H until a scalar is read: __contains__ must not materialize."""
    call = packed_jit(_step, donate_argnums=())
    _, logs = call(jnp.asarray(0.0), jnp.ones((2, 2)))
    assert "a scalar" in logs  # membership via key list only
    assert not logs._materialized
    assert logs["a scalar"] == 4.0
    assert logs._materialized


def test_packed_jit_donation():
    """donate_argnums passes through to the wrapped jit (donated state buffer)."""
    call = packed_jit(_step, donate_argnums=(0,))
    state = jnp.asarray(2.0)
    new_state, logs = call(state, jnp.ones((2, 2)))
    assert float(new_state) == 6.0
    if jax.default_backend() != "cpu":  # CPU backend ignores donation
        assert state.is_deleted()
    # a second call with the new state keeps working (no stale capture)
    new_state2, logs2 = call(new_state, jnp.ones((2, 2)))
    assert float(new_state2) == 10.0
    assert logs2["a scalar"] == 4.0
