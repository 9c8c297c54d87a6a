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


def test_distributed_helpers_single_process():
    """Multi-host wiring (onda_tpu/parallel/distributed): index partitioning is a
    disjoint equal split across hosts, and global_batch assembles host-local
    arrays into a data-sharded global jax.Array (single-process here, so the
    local shard IS the global batch)."""
    from onda_tpu.parallel import global_batch, host_local_batch_indices, initialize
    from onda_tpu.parallel.mesh import make_mesh

    initialize()  # single host: must be a no-op

    # simulate 4 hosts, global batch 8 over 35 samples
    per_host = [
        list(host_local_batch_indices(35, 8, process_index=p, process_count=4, seed=7))
        for p in range(4)
    ]
    n_batches = 35 // 8
    assert all(len(b) == n_batches for b in per_host)
    for step in range(n_batches):
        chunks = [b[step] for b in per_host]
        assert all(len(c) == 2 for c in chunks)
        merged = np.concatenate(chunks)
        assert len(np.unique(merged)) == 8  # disjoint cover of the global batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    batch = {"image": np.ones((8, 4, 4, 3), np.float32), "valid": 8}
    g = global_batch(mesh, batch)
    assert g["image"].shape == (8, 4, 4, 3)
    assert g["image"].sharding.spec == jax.sharding.PartitionSpec("data", None, None, None)
    assert g["valid"] == 8
