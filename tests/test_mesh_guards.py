"""Multi-host safety guards in parallel/mesh.py.

Real multi-process runs can't execute inside a single-host test, but the guard
logic is pure host Python gated on `jax.process_count()` — monkeypatch it to
simulate a multi-host world and pin the refuse-loudly behavior (a silent
mismatch would desynchronize hosts or corrupt "global" values).
"""

import jax
import numpy as np
import pytest

from onda_tpu.parallel import mesh as M


def test_auto_mesh_caps_to_batch_divisor():
    # single host, 8 virtual devices (conftest): batch 6 → largest divisor ≤ 8
    m = M.data_parallel_mesh(None, batch_size=6)
    assert m is not None and m.size == 6
    m = M.data_parallel_mesh(None, batch_size=8)
    assert m.size == 8


def test_explicit_mesh_must_divide_batch():
    with pytest.raises(ValueError, match="does not divide"):
        M.data_parallel_mesh(3, batch_size=8)


def test_multihost_refuses_subset_mesh(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # auto mode: batch 6 would cap the mesh to 6 of 8 devices → refuse
    with pytest.raises(ValueError, match="does not divide the 8 global"):
        M.data_parallel_mesh(None, batch_size=6)
    # explicit subset request → refuse
    with pytest.raises(ValueError, match="must equal the 8 global"):
        M.data_parallel_mesh(4, batch_size=8)
    # clean fit stays allowed
    assert M.data_parallel_mesh(None, batch_size=8).size == 8


def test_multihost_place_batch_refuses_odd_global_batch(monkeypatch):
    m = M.make_mesh(8)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # local 3 × 2 hosts = global 6, not divisible by mesh 8 → must raise, not
    # silently replicate host-local (i.e. divergent) arrays
    with pytest.raises(ValueError, match="not divisible by the data-axis"):
        M.place_batch(m, {"image": np.zeros((3, 4, 4, 3), np.float32)})


def test_singlehost_place_batch_replicates_odd_batch():
    m = M.make_mesh(8)
    out = M.place_batch(m, {"image": np.zeros((3, 4, 4, 3), np.float32)})
    # odd batch on one host: replicated (no error), full value everywhere
    assert out["image"].shape == (3, 4, 4, 3)
    assert out["image"].sharding.is_fully_replicated


def test_tensor_parallel_option_guards(monkeypatch):
    # boolean true is a config mistake, not "all devices"
    with pytest.raises(ValueError, match="integer"):
        M.data_parallel_setup(None, 8, tensor_parallel=True)
    # tp must divide the visible device count (8 virtual devices)
    with pytest.raises(ValueError, match="does not divide the 8"):
        M.data_parallel_setup(None, 8, tensor_parallel=3)
    # single-process only: multi-host TP would need per-host channel shards
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process"):
        M.data_parallel_setup(None, 8, tensor_parallel=2)


def test_tensor_parallel_shardings_rule():
    m = M.make_mesh(shape=(2, 4), axes=("data", "model"))
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    tree = {
        "conv_kernel": jnp.zeros((3, 3, 64, 256)),   # C_out 256 % 4 == 0 → sharded
        "bn_scale": jnp.zeros((512,)),               # sharded
        "head": jnp.zeros((1, 1, 256, 19)),          # 19 classes → replicated
        "narrow": jnp.zeros((64,)),                  # < min_dim → replicated
        "scalar": jnp.zeros(()),
        "rng": jax.random.key(0),                    # typed key → replicated
    }
    sh = M.tensor_parallel_shardings(m, tree)
    assert sh["conv_kernel"].spec == P(None, None, None, "model")
    assert sh["bn_scale"].spec == P("model")
    assert sh["head"].spec == P()
    assert sh["narrow"].spec == P()
    assert sh["scalar"].spec == P()
    assert sh["rng"].spec == P()
