"""Architecture parity: Flax DeepLab-v2 vs the reference torch model.

Random torch weights are exported through the checkpoint importer and the two
models must produce the same logits/features — this validates geometry, padding,
BN semantics and the importer in one shot (SURVEY.md §7.2 steps 3 & 5).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.models import build_deeplab_v2
from onda_tpu.models.import_torch import imagenet_prefix_surgery, torch_state_dict_to_flax

from .torch_ref import build_pair

torch = pytest.importorskip("torch")

H, W = 64, 128  # smoke resolution (→ 9×17 output grid, reference RESOLUTION [128, 64])


@pytest.mark.slow
def test_forward_parity_proda(rng):
    """Tight parity on a shallow stack (isolates geometry/importer/GN/SE/head
    correctness from cross-backend float drift, which grows with depth)."""
    tmodel, fmodel, variables = build_pair()
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        aux_t, main_t = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    aux_f, main_f = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(variables, jnp.asarray(x))
    assert aux_t is None and aux_f is None
    got_out = np.moveaxis(np.asarray(main_f["out"]), -1, 1)
    got_feat = np.moveaxis(np.asarray(main_f["feat"]), -1, 1)
    np.testing.assert_allclose(got_out, main_t["out"].numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got_feat, main_t["feat"].numpy(), rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_forward_parity_r50_envelope(rng):
    """Full R50: 53 conv layers accumulate ~1e-3 cross-backend float drift; this
    is a gross-error envelope, the tight check lives on the shallow variant."""
    tmodel, fmodel, variables = build_pair(layers=(3, 4, 6, 3))
    x = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        _, main_t = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    _, main_f = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(variables, jnp.asarray(x))
    got = np.moveaxis(np.asarray(main_f["out"]), -1, 1)
    want = main_t["out"].numpy()
    np.testing.assert_allclose(got, want, rtol=0.2, atol=5e-3)
    # argmax agreement is what matters for mIoU parity
    agree = (got.argmax(1) == want.argmax(1)).mean()
    assert agree > 0.95, agree


@pytest.mark.slow
def test_forward_parity_multilevel_train_bn(rng):
    """Train-mode BN (batch-stat normalization) + aux head parity + stats update."""
    tmodel, fmodel, variables = build_pair(multi_level=True)
    tmodel.train()
    for m in tmodel.modules():  # dropout randomness can't be matched; disable both sides
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        aux_t, main_t = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    (aux_f, main_f), mutated = jax.jit(
        lambda v, xx: fmodel.apply(v, xx, train=True, update_stats=True, mutable=["batch_stats"])
    )(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(main_f["out"]), -1, 1), main_t["out"].numpy(), rtol=1e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(aux_f["out"]), -1, 1), aux_t["out"].numpy(), rtol=1e-3, atol=3e-4
    )
    # running stats updated identically (torch momentum 0.1 default)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn1"]["running_mean"]),
        tmodel.bn1.running_mean.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn1"]["running_var"]),
        tmodel.bn1.running_var.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_output_grid_shape():
    """Stride-8+1 output grid: input H×W → (H/8+1, W/8+1) (reference geometry)."""
    fmodel = build_deeplab_v2(layers=(1, 1, 1, 1))
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, 64, 128, 3)), train=False)
    _, main = fmodel.apply(variables, jnp.zeros((1, 64, 128, 3)), train=False)
    assert main["out"].shape == (1, 9, 17, 19)
    assert main["feat"].shape == (1, 9, 17, 256)


def test_imagenet_prefix_surgery():
    sd = {
        "Scale.conv1.weight": 1,
        "module.layer1.0.conv1.weight": 2,
        "layer5.head.weight": 3,
        "fc.weight": 4,
        "bn1.weight": 5,
    }
    out = imagenet_prefix_surgery(sd)
    assert out == {"conv1.weight": 1, "layer1.0.conv1.weight": 2, "bn1.weight": 5}


def test_bn_custom_vjp_matches_autodiff(rng):
    """The closed-form BN backward must equal autodiff of the same math."""
    import jax
    from jax import lax

    from onda_tpu.models.layers import _bn_train

    x = rng.normal(size=(2, 5, 7, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    cot = rng.normal(size=(2, 5, 7, 16)).astype(np.float32)

    def ref_fn(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(0, 1, 2))
        var = jnp.maximum((x32 * x32).mean(axis=(0, 1, 2)) - mean**2, 0.0)
        inv = lax.rsqrt(var + 1e-5) * scale
        return (x32 - mean) * inv + bias

    def custom_fn(x, scale, bias):
        return _bn_train(x, scale, bias, 1e-5)[0]

    loss = lambda f: (lambda *a: (f(*a) * jnp.asarray(cot)).sum())
    g_ref = jax.jit(jax.grad(loss(ref_fn), argnums=(0, 1, 2)))(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)
    )
    g_cus = jax.jit(jax.grad(loss(custom_fn), argnums=(0, 1, 2)))(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)
    )
    for a, b in zip(g_ref, g_cus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_torch_export_roundtrip(tmp_path):
    """flax → .pth → flax must be exact, and the exported state_dict must load
    into the reference torch model (key/shape compatible)."""
    from onda_tpu.models.import_torch import (
        flax_to_torch_state_dict,
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    tmodel, fmodel, variables = build_pair(layers=(1, 1, 1, 1))
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(variables, path)
    back = torch_state_dict_to_flax(load_torch_checkpoint(path), variables)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for key, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val), np.asarray(flat_b[key]), err_msg=str(key))
    # torch-side load: the reference CLI always builds its model with the aux
    # head structurally present (model_handler.py:18-26) and loads checkpoints
    # STRICTLY (model_handler.py:57) — our export must survive exactly that,
    # including layer5.* (our structural aux) and num_batches_tracked
    from .oracle import import_reference

    ref_mod = import_reference("framework.model.deeplabv2")
    tmodel_structural = ref_mod.get_deeplab_v2(
        num_classes=19, multi_level=True, layers=[1, 1, 1, 1], classifier="ProDA")
    sd = torch.load(path, weights_only=True)
    tmodel_structural.load_state_dict(sd)  # strict
    # and a torch model built WITHOUT the aux must also accept it loosely,
    # with layer5 the only unexpected remainder
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert all(k.startswith("layer5.") for k in unexpected), unexpected
    assert not missing, missing
