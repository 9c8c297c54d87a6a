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


def test_spatial_sharding_forward():
    """2×4 (data × spatial) mesh: image H sharded; XLA handles conv halo exchange
    (SURVEY.md §2.16 — the spatial analog of sequence parallelism)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from onda_tpu.models import build_deeplab_v2

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    model = build_deeplab_v2(num_classes=19, layers=(1, 1, 1, 1))
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x[:1], train=False)
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    xs = jax.device_put(np.zeros((2, 64, 64, 3), np.float32),
                        NamedSharding(mesh, P("data", "spatial")))
    _, main = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, xs)
    assert main["out"].shape == (2, 9, 9, 19)
    assert np.isfinite(np.asarray(main["out"])).all()
