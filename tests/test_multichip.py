"""Multi-chip sharding: the full adaptation step over a virtual 8-device mesh."""

import numpy as np
import pytest
import jax


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
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


@pytest.mark.slow
def test_full_step_data_x_spatial_matches_unsharded():
    """The ENTIRE fused adaptation step (teachers, switch, prototypes, losses,
    merged student grad, SGD/EMA) under a combined 2x4 data x spatial mesh:
    batch sharded over `data`, image H over `spatial` — the scaling shape for
    >1024^2 inputs (SURVEY.md §2.16). GSPMD must insert halo exchanges for the
    convs and cross-device reductions for BN/prototype/monitor statistics, and
    the result must EQUAL the unsharded single-device run (round-2 verdict
    weak #3: finite is not enough — the equality version of this assertion is
    what exposed the vmap+2-D-mesh GSPMD grad miscompilation documented in
    tools/repro_vmap_spatial_grad.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    base = ge._run_fused_step("none", 8, B=2, H=64, W=64)
    sp = ge._run_fused_step("spatial", 8, B=2, H=64, W=64)
    assert np.isfinite(sp[0])
    assert sp[0] == pytest.approx(base[0], rel=2e-4)  # total target loss
    assert sp[1] == pytest.approx(base[1], rel=1e-4)  # sum |params|


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
def test_advent_step_on_virtual_mesh():
    """The ADVENT fused step (student SGD + 2 discriminator Adams) compiles and
    runs under an 8-device data-parallel mesh — the prototype step already has
    dryrun coverage; this closes the gap for the adversarial family."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from onda_tpu.config import cfg_from_file, default_config
    from onda_tpu.methods.advent import AdventAdapter
    from onda_tpu.models import build_deeplab_v2

    n = 8
    B, H, W, C = n, 32, 64, 19
    cfg = cfg_from_file("configs/advent.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.TRAINING.BATCH_SIZE = B
    cfg.OTHERS.DATA_PARALLEL = n
    cfg.MODEL.MULTI_LEVEL = False
    spec = cfg.METHOD.ADAPTATION.ADVENT
    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False))
    adapter = AdventAdapter(model, variables, cfg, spec, num_classes=C)
    assert adapter.mesh is not None and adapter.mesh.devices.size == n

    rng = np.random.default_rng(0)
    hr, wr = H, W  # advent losses run at input resolution
    src = adapter._place(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    src_lbl = adapter._place(rng.integers(0, C, size=(B, hr, wr)).astype(np.int32))
    trg = adapter._place(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    step = adapter.step_fn()
    state, logs = step(adapter.state, src, src_lbl, trg,
                       jnp.asarray(1e-5, jnp.float32), jnp.asarray(1e-5, jnp.float32))
    for key in ("Segmentation loss", "Adversarial loss", "Discriminator loss"):
        assert np.isfinite(float(logs[key])), key


@pytest.mark.slow
def test_full_step_tensor_parallel_matches_replicated():
    """cfg.OTHERS.TENSOR_PARALLEL: the full fused step under a 2x4
    (data x model) mesh with channel-sharded params (SURVEY.md 2.16: TP
    exposed via pjit sharding rules). GSPMD turns contractions over sharded
    C_in into model-axis psums; the result must match the unsharded run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from onda_tpu.config import cfg_from_file, default_config
    from onda_tpu.methods.proto_online import ProtoOnlineAdapter
    from onda_tpu.models import build_deeplab_v2

    B, H, W, C = 2, 32, 64, 19
    rng = np.random.default_rng(0)
    hr, wr = H // 8 + 1, W // 8 + 1
    trg_np = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    src_np = rng.normal(size=(1, B, H, W, 3)).astype(np.float32)
    lbl_np = rng.integers(0, C, size=(1, B, hr, wr)).astype(np.int32)
    boot_np = rng.integers(0, C, size=(B, H, W)).astype(np.int32)

    def run(tensor_parallel):
        cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
        cfg.SCHEME.RESOLUTION = [W, H]
        cfg.TRAINING.BATCH_SIZE = B
        if tensor_parallel:
            cfg.OTHERS.TENSOR_PARALLEL = 4  # 8 devices -> (data=2, model=4)
        else:
            cfg.OTHERS.DATA_PARALLEL = False
        spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
        spec.LOAD_PROTO = None
        spec.set_ = f"tp_test_{int(bool(tensor_parallel))}"
        model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
        variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
        adapter = ProtoOnlineAdapter(model, variables, cfg, spec, num_classes=C)
        if tensor_parallel:
            shape = dict(zip(adapter.mesh.axis_names, adapter.mesh.devices.shape))
            assert shape == {"data": 2, "model": 4}
            sharded = [
                leaf for leaf in jax.tree.leaves(adapter.state.params)
                if "model" in tuple(leaf.sharding.spec)
            ]
            assert sharded, "no param leaf actually sharded over the model axis"

        boot = adapter._build_bootstrap(from_source_labels=True)
        adapter.state = boot(adapter.state, adapter._place(trg_np), adapter._place(boot_np),
                             adapter._place(np.ones(len(trg_np), np.float32)))
        step = adapter.step_fn(have_src=True, source_repeat=1, want_soft=False)
        lr = jnp.asarray(1e-4, jnp.float32)
        state = adapter.state
        for _ in range(2):
            state, logs = step(state, adapter._place(trg_np),
                               adapter._place(src_np, 1), adapter._place(lbl_np, 1), lr)
        psum = float(sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(state.params)))
        return float(logs["Total target loss"]), psum

    loss_rep, p_rep = run(False)
    loss_tp, p_tp = run(True)
    assert np.isfinite(loss_tp)
    assert loss_tp == pytest.approx(loss_rep, rel=2e-4)
    assert p_tp == pytest.approx(p_rep, rel=1e-4)


@pytest.mark.slow  # two tiny-model jit compiles on one XLA:CPU core
def test_bootstrap_padding_matches_unsharded(tmp_path):
    """Mesh-divisibility padding of the (reference-faithful) single-sample
    bootstrap batches must not perturb the prototypes: boot runs train-mode
    batch-stat BN, so zero-pad rows used to contaminate the batch mean/var
    that normalizes the real rows (advisor r4 medium — fixed by tiling the
    real rows; exact because all rows of the padded batch are identical)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from onda_tpu.config import cfg_from_file, default_config
    from onda_tpu.methods.proto_online import ProtoOnlineAdapter
    from onda_tpu.models import build_deeplab_v2

    B, H, W, C = 1, 32, 64, 19
    rng = np.random.default_rng(3)
    img = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    lbl = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    loader = [{"image": img, "label": lbl}]

    def protos(data_parallel):
        cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
        cfg.SCHEME.RESOLUTION = [W, H]
        # TRAINING batches fill the mesh; the bootstrap loader still yields
        # reference-faithful SINGLE-sample batches → pad path exercised
        cfg.TRAINING.BATCH_SIZE = 8
        cfg.OTHERS.DATA_PARALLEL = data_parallel
        cfg.OTHERS.SNAPSHOT_DIR = str(tmp_path / f"dp{data_parallel}")
        spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
        spec.LOAD_PROTO = None
        spec.STARTING_PROTO = "source"
        model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
        variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
        adapter = ProtoOnlineAdapter(model, variables, cfg, spec, num_classes=C)
        if data_parallel:
            assert adapter.mesh is not None  # padding path actually exercised
        adapter.calculate_prototypes(loader)
        return jax.tree.leaves(adapter.state.proto)

    ref = protos(False)     # mult=1: no padding, the ground truth
    sharded = protos(8)     # mult=8: a 1-row batch padded with 7 tiled rows
    for a, b in zip(ref, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
