"""Fused-step smoke tests on a tiny model: each policy runs, state evolves, logs
carry the reference's key names, and evaluation produces finite mIoU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.config import cfg_from_file, default_config
from onda_tpu.methods.proto_online import MONITOR_KEYS, ProtoOnlineAdapter
from onda_tpu.models import build_deeplab_v2

B, H, W, C = 2, 32, 64, 19
HR, WR = H // 8 + 1, W // 8 + 1


def tiny_adapter(method="PROTO_ONLINE_HYBRIDSWITCH", dtype=None, **spec_over):
    cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.METHOD.ADAPTATION.NAME = method
    spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH.copy()
    spec.LOAD_PROTO = None
    spec.set_ = "test"
    for k, v in spec_over.items():
        spec[k] = v
    cfg.METHOD.ADAPTATION[method] = spec
    cfg.OTHERS.SNAPSHOT_DIR = "/tmp/onda_test_snaps"
    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1), dtype=dtype)
    variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    return ProtoOnlineAdapter(model, variables, cfg, spec, num_classes=C)


def fake_batch(rng, with_labels=True):
    batch = {"image": rng.normal(size=(B, H, W, 3)).astype(np.float32)}
    if with_labels:
        lbl = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
        batch["label"] = lbl
        batch["label_res"] = rng.integers(0, C, size=(B, HR, WR)).astype(np.int32)
    return batch


@pytest.fixture(scope="module")
def adapter():
    rng = np.random.default_rng(0)
    ad = tiny_adapter()
    # bootstrap prototypes from "source" labels so variances are well-defined
    class OneBatch:
        def __iter__(self):
            return iter([fake_batch(rng)])

    ad.cfg_spec.STARTING_PROTO = "source"
    ad.calculate_prototypes(OneBatch())
    return ad


@pytest.mark.parametrize("method", [
    "PROTO_ONLINE", "PROTO_ONLINE_HSWITCH", "PROTO_ONLINE_VSWITCH", "PROTO_ONLINE_HYBRIDSWITCH",
])
def test_step_runs_all_policies(adapter, method):
    from onda_tpu.methods.prior_policy import POLICY_BY_METHOD

    adapter.policy = POLICY_BY_METHOD[method]
    adapter._step_cache.clear()
    rng = np.random.default_rng(1)
    step = adapter.step_fn(have_src=True, source_repeat=1, want_soft=False)
    state = adapter.state
    # snapshot before the call: the jitted step donates its input state.
    # use a head param — the first tree leaf is frozen backbone-BN affine.
    p0 = np.asarray(state.params["layer6"]["head_conv"]["kernel"])
    step0 = int(state.step)
    src = fake_batch(rng)
    trg = fake_batch(rng)
    state2, logs = step(
        state,
        jnp.asarray(trg["image"]),
        jnp.asarray(src["image"][None]),
        jnp.asarray(src["label_res"][None]),
        jnp.asarray(1e-3, jnp.float32),
    )
    adapter.state = state2  # keep the fixture alive for the next test
    for key in ("ce_loss", "rce_loss", "Total target loss", "buff_loss",
                "pseudolabel_pixel_num", "output & prototype agreement",
                "dev avg prior static", "encoder_lr"):
        assert key in logs and np.isfinite(float(logs[key])), key
    for key in MONITOR_KEYS:
        assert f"{key} confidence ma" in logs
    assert int(state2.step) == step0 + 1
    # student moved, EMA moved toward student, prototypes finite
    p1 = state2.params["layer6"]["head_conv"]["kernel"]
    assert not np.allclose(p0, np.asarray(p1))
    # frozen backbone BN affine params must NOT move (reference deeplabv2.py:25-48)
    assert np.allclose(
        np.asarray(state2.params["bn1"]["scale"]), 1.0
    ) and np.allclose(np.asarray(state2.params["bn1"]["bias"]), 0.0)
    assert np.isfinite(np.asarray(state2.proto.mean)).all()


def test_eval_produces_miou(adapter):
    rng = np.random.default_rng(2)

    class Loader:
        def __iter__(self):
            return iter([fake_batch(rng)])

    res = adapter.evaluate_all({"clear": Loader()})
    assert "Val mIoU model of clear" in res
    assert np.isfinite(res["Val mIoU model of clear"])


def test_checkpoint_roundtrip(adapter, tmp_path):
    from onda_tpu.utils import checkpoint as ckpt

    path = str(tmp_path)
    ckpt.save_state(adapter.state, path)
    restored = ckpt.load_state(adapter.state, path)
    a = jax.tree.leaves(adapter.state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(adapter.state.step)


def test_checkpoint_async_save(adapter, tmp_path):
    """OTHERS.ASYNC_SAVE path: `wait=False` saves overlap the caller; a load
    (or the next save of the same path) barriers on the in-flight write."""
    from onda_tpu.utils import checkpoint as ckpt

    path = str(tmp_path)
    ckpt.save_state(adapter.state, path, name="async_state", wait=False)
    # immediate overwrite while the first write may still be in flight
    ckpt.save_state(adapter.state, path, name="async_state", wait=False)
    restored = ckpt.load_state(adapter.state, path, name="async_state")
    a = jax.tree.leaves(adapter.state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.wait_for_saves()  # idempotent once drained


def test_checkpoint_sync_save_after_async(adapter, tmp_path):
    """A `wait=True` save must drain an in-flight async write to the same path
    before writing (two writers racing a rename into one target directory),
    and the synchronous write must be the one that sticks."""
    from onda_tpu.utils import checkpoint as ckpt

    path = str(tmp_path)
    ckpt.save_state(adapter.state, path, name="mixed_state", wait=False)
    bumped = adapter.state.replace(step=adapter.state.step + 41)
    ckpt.save_state(bumped, path, name="mixed_state", wait=True)
    restored = ckpt.load_state(adapter.state, path, name="mixed_state")
    assert int(restored.step) == int(adapter.state.step) + 41


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
def test_exact_resume(adapter, tmp_path):
    """Checkpoint → restore → step must equal the uninterrupted run (the
    reference cannot do this — optimizer/EMA/monitor state is lost, SURVEY §5.4)."""
    from onda_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(7)
    step = adapter.step_fn(have_src=True, source_repeat=1, want_soft=False)
    args = lambda: (
        jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, B, H, W, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, C, size=(1, B, HR, WR)).astype(np.int32)),
        jnp.asarray(1e-3, jnp.float32),
    )
    a1 = args()
    ckpt.save_state(adapter.state, str(tmp_path), name="resume_test")
    restored = ckpt.load_state(adapter.state, str(tmp_path), name="resume_test")

    s_direct, logs_direct = step(adapter.state, *a1)
    s_resumed, logs_resumed = step(restored, *a1)
    np.testing.assert_array_equal(
        np.asarray(s_direct.params["layer6"]["head_conv"]["kernel"]),
        np.asarray(s_resumed.params["layer6"]["head_conv"]["kernel"]),
    )
    assert float(logs_direct["Total target loss"]) == float(logs_resumed["Total target loss"])
    adapter.state = s_resumed


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
def test_adaptation_reduces_target_loss(adapter):
    """Gradient sanity: repeated steps on a fixed target batch must fit the
    (slow-moving) teacher pseudo-labels — total target loss decreases."""
    rng = np.random.default_rng(11)
    step = adapter.step_fn(have_src=True, source_repeat=1, want_soft=False)
    trg = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(1, B, H, W, 3)).astype(np.float32))
    src_lbl = jnp.asarray(rng.integers(0, C, size=(1, B, HR, WR)).astype(np.int32))
    # note LR_RATIO 80:10 scales this by 80 for the backbone
    lr = jnp.asarray(1e-4, jnp.float32)
    state = adapter.state
    losses = []
    for _ in range(12):
        state, logs = step(state, trg, src, src_lbl, lr)
        losses.append(float(logs["Total target loss"]))
    adapter.state = state
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
@pytest.mark.parametrize("bn_policy,source_repeat,precision,style", [
    ("freeze", 1, "f32", "unroll"), ("double", 1, "f32", "unroll"),
    ("freeze", 2, "f32", "unroll"),
    # the vmap formulation (correct on 1-D meshes only — see
    # tools/repro_vmap_spatial_grad.py) must still equal the sequential
    # schedule on a single device
    ("freeze", 1, "f32", "vmap"), ("freeze", 2, "f32", "vmap"),
    # bf16 (the headline TPU mode): the merged/sequential schedules round at
    # different points, so equivalence holds at bf16 resolution (~2^-8)
    ("freeze", 1, "bf16", "unroll"),
])
def test_merged_src_trg_pass_matches_sequential(bn_policy, source_repeat, precision,
                                                style, monkeypatch):
    """The merged source+target gradient pass (ONDA_MERGE_SRC_TRG=1, default;
    both ONDA_MERGE_STYLE formulations) must be numerically equivalent to the
    sequential two-forward schedule: same losses, same updated params/batch
    stats (BN statistics are computed per slice, dropout keys are identical
    per slice)."""
    monkeypatch.setenv("ONDA_MERGE_STYLE", style)
    rng = np.random.default_rng(7)
    srcs = [fake_batch(rng) for _ in range(source_repeat)]
    trg = fake_batch(rng)
    src_images = np.stack([b["image"] for b in srcs])
    src_labels = np.stack([b["label_res"] for b in srcs])
    dtype = jnp.bfloat16 if precision == "bf16" else None
    loss_tol = dict(rtol=2e-4, atol=1e-6) if dtype is None else dict(rtol=2e-2, atol=1e-3)
    tree_tol = dict(rtol=1e-4, atol=1e-6) if dtype is None else dict(rtol=2e-2, atol=2e-3)
    kern_tol = dict(rtol=1e-3, atol=1e-6) if dtype is None else dict(rtol=2e-2, atol=2e-3)

    def run(merge_flag):
        monkeypatch.setenv("ONDA_MERGE_SRC_TRG", merge_flag)
        ad = tiny_adapter(BN_POLICY=bn_policy, dtype=dtype)

        class OneBatch:
            def __iter__(self):
                return iter([fake_batch(np.random.default_rng(0))])

        ad.cfg_spec.STARTING_PROTO = "source"
        ad.calculate_prototypes(OneBatch())
        step = ad.step_fn(have_src=True, source_repeat=source_repeat, want_soft=False)
        state2, logs = step(
            ad.state,
            jnp.asarray(trg["image"]),
            jnp.asarray(src_images),
            jnp.asarray(src_labels),
            jnp.asarray(1e-3, jnp.float32),
        )
        return state2, logs

    s_seq, l_seq = run("0")
    s_mrg, l_mrg = run("1")
    for key in ("ce_loss", "rce_loss", "buff_ce_loss", "buff_rce_loss",
                "Total target loss"):
        np.testing.assert_allclose(
            float(l_seq[key]), float(l_mrg[key]), err_msg=key, **loss_tol
        )
    kp_seq = np.asarray(s_seq.params["layer6"]["head_conv"]["kernel"])
    kp_mrg = np.asarray(s_mrg.params["layer6"]["head_conv"]["kernel"])
    np.testing.assert_allclose(kp_seq, kp_mrg, **kern_tol)
    flat_seq = dict(jax.tree_util.tree_flatten_with_path(s_seq.batch_stats)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(s_mrg.batch_stats)[0]:
        np.testing.assert_allclose(
            np.asarray(flat_seq[path]), np.asarray(leaf), err_msg=str(path),
            **tree_tol,
        )
    if bn_policy == "double":
        flat_seq = dict(jax.tree_util.tree_flatten_with_path(s_seq.alt_batch_stats)[0])
        for path, leaf in jax.tree_util.tree_flatten_with_path(s_mrg.alt_batch_stats)[0]:
            np.testing.assert_allclose(
                np.asarray(flat_seq[path]), np.asarray(leaf), err_msg=str(path),
                **tree_tol,
            )


@pytest.mark.slow  # ~25-250 s on one XLA:CPU core; full suite covers it
def test_remat_matches_default():
    """OTHERS.REMAT (per-bottleneck nn.remat in the model) must not change any
    numbers — it only trades memory for recompute. The variable tree is
    unchanged, so remat and non-remat models share checkpoints."""
    from onda_tpu.models import build_deeplab_v2

    rng = np.random.default_rng(5)
    src = fake_batch(rng)
    trg = fake_batch(rng)

    def run(remat):
        ad = tiny_adapter()
        if remat:  # same params/batch_stats tree; only the backward changes
            ad.model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1), remat=True)

        class OneBatch:
            def __iter__(self):
                return iter([fake_batch(np.random.default_rng(0))])

        ad.cfg_spec.STARTING_PROTO = "source"
        ad.calculate_prototypes(OneBatch())
        step = ad.step_fn(have_src=True, source_repeat=1, want_soft=False)
        return step(
            ad.state,
            jnp.asarray(trg["image"]),
            jnp.asarray(src["image"][None]),
            jnp.asarray(src["label_res"][None]),
            jnp.asarray(1e-3, jnp.float32),
        )

    s_a, l_a = run(False)
    s_b, l_b = run(True)
    np.testing.assert_allclose(
        float(l_a["Total target loss"]), float(l_b["Total target loss"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_a.params["layer6"]["head_conv"]["kernel"]),
        np.asarray(s_b.params["layer6"]["head_conv"]["kernel"]),
        rtol=1e-4, atol=1e-7,
    )


def test_domain_change_does_not_invalidate_step_cache():
    """The CLI mutates the SAME spec per domain (set_, SKIP_CALC) and calls
    update_cfg_spec; unchanged trace-relevant values must keep the cached
    compiled step (CLAUDE.md invariant), while a real value change (e.g. a
    DOMAIN_OPTIONS loss-weight override) must invalidate it."""
    ad = tiny_adapter()
    step = ad.step_fn(have_src=False, source_repeat=1, want_soft=False)

    # domain transition: same spec object, host-only keys mutated
    ad.cfg_spec.set_ = "next_domain"
    ad.cfg_spec.SKIP_CALC = True
    ad.cfg_spec.EPOCHS = 7
    ad.update_cfg_spec(ad.cfg_spec)
    assert ad.step_fn(have_src=False, source_repeat=1, want_soft=False) is step

    # a trace-relevant override invalidates
    ad.cfg_spec.RCE_ALPHA = float(ad.cfg_spec.RCE_ALPHA) + 0.05
    ad.update_cfg_spec(ad.cfg_spec)
    assert not ad._step_cache
    assert ad.step_fn(have_src=False, source_repeat=1, want_soft=False) is not step


def test_training_path_prediction_dump_format(tmp_path, adapter_factory=None):
    """The per-step PREDICTION_SAVE dump during TRAINING must use the same
    reference format as EVALUATION mode: NCHW torch .pt batches
    (reference save_prediction, adaptation_model.py:218-232)."""
    import torch

    from onda_tpu.methods.proto_online import dump_logits_batch

    logits_nhwc = np.random.default_rng(0).normal(size=(2, 5, 9, 19)).astype(np.float32)
    dump_logits_batch(str(tmp_path), 3, logits_nhwc)
    loaded = torch.load(str(tmp_path / "batch-3.pt"))
    assert loaded.shape == (2, 19, 5, 9)
    np.testing.assert_allclose(loaded.numpy(), logits_nhwc.transpose(0, 3, 1, 2))
    # consumer round-trip: the reference stores `model(...)[1]["out"].cpu()`
    # (a CPU float32 torch.Tensor) and downstream code computes
    # `softmax(axis=1).max(axis=1)[0]` on it (adaptation_model.py:218-249)
    assert isinstance(loaded, torch.Tensor) and not isinstance(loaded, np.ndarray)
    assert loaded.dtype == torch.float32 and loaded.device.type == "cpu"
    conf = loaded.softmax(axis=1).max(axis=1)[0].mean()
    assert torch.isfinite(conf)
