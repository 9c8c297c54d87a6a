"""True Microsoft-ProDA checkpoint import: key layout + forward parity.

The `DeepLabv2-Resnet101-ProDA` model name resolves to reference
deeplabv2_proda.py's ResNet101 (reference model_handler.py:28-30), whose
checkpoint layout differs from the OnDA deeplabv2: the sole classifier lives at
`layer5`, the head is a Sequential with a leading Dropout (`head.1` conv), and
bn_clr optionally inserts a `bn_pretrain` BatchNorm(2048) before the head
(reference deeplabv2_proda.py:310-419). These tests build that reference module
as a black-box oracle, import its state_dict through the production importer,
and require forward parity — including the bn_clr variant the reference's own
handler cannot even load (it hardcodes bn_clr=False, model_handler.py:30).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.models import build_deeplab_v2
from onda_tpu.models.import_torch import torch_state_dict_to_flax

from .oracle import import_reference
from .torch_ref import healthy_init

torch = pytest.importorskip("torch")

H, W = 64, 128


def build_proda_pair(bn_clr=False, layers=(1, 1, 1, 1)):
    ref_mod = import_reference("framework.model.deeplabv2_proda")
    torch.manual_seed(0)
    tmodel = ref_mod.ResNet101(
        ref_mod.Bottleneck, list(layers), 19, torch.nn.BatchNorm2d, bn_clr=bn_clr
    )
    healthy_init(tmodel)
    tmodel.eval()
    fmodel = build_deeplab_v2(
        num_classes=19, layers=layers, classifier="ProDA", multi_level=False,
        proda_layout=True, bn_clr=bn_clr,
    )
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    variables = torch_state_dict_to_flax(tmodel.state_dict(), variables)
    return tmodel, fmodel, variables


@pytest.mark.slow
@pytest.mark.parametrize("bn_clr", [False, True])
def test_proda_forward_parity(rng, bn_clr):
    """Imported weights reproduce the reference forward — feat and logits.

    Reference forward returns (None, {"feat","out"}) with feat taken after the
    head's Dropout (deeplabv2_proda.py:397-419, 243-255); eval mode makes the
    Dropout an identity on both sides.
    """
    tmodel, fmodel, variables = build_proda_pair(bn_clr=bn_clr)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        aux_t, main_t = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    aux_f, main_f = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    assert aux_t is None and aux_f is None
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(main_f["out"]), -1, 1), main_t["out"].numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(main_f["feat"]), -1, 1), main_t["feat"].numpy(),
        rtol=1e-3, atol=2e-4)


def test_proda_import_covers_every_torch_key():
    """Every reference parameter/buffer lands in the flax tree (nothing silently
    keeps its random init), and the export direction round-trips bit-exact."""
    from onda_tpu.models.import_torch import flax_to_torch_state_dict

    tmodel, _, variables = build_proda_pair(bn_clr=True)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    back = flax_to_torch_state_dict(variables)
    assert set(back) == set(sd), (
        sorted(set(sd) ^ set(back))[:8])
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_proda_container_checkpoint_loads(tmp_path):
    """Microsoft ProDA training checkpoints wrap the weights as
    {"ResNet101": {"model_state": sd}} (reference deeplabv2_proda.py:525-527);
    load_torch_checkpoint unwraps that container."""
    from onda_tpu.models.import_torch import load_torch_checkpoint

    tmodel, _, _ = build_proda_pair(bn_clr=True)
    path = tmp_path / "proda_ckpt.pth"
    torch.save({"ResNet101": {"model_state": tmodel.state_dict()},
                "ema": None, "iter": 123}, path)
    sd = load_torch_checkpoint(str(path))
    assert any(k.startswith("layer5.") for k in sd)
    assert any(k.startswith("bn_pretrain.") for k in sd)


@pytest.mark.slow
def test_registry_autodetects_bn_clr_and_loads_real_r101(tmp_path):
    """End-to-end through the registry: a full-geometry bn_clr R101 checkpoint
    (saved in the ProDA training-container format) is probed, the bn_clr model
    is built, and every weight imports — the path the reference's own handler
    cannot take (model_handler.py:30 hardcodes bn_clr=False)."""
    from onda_tpu.config import default_config
    from onda_tpu.registry import get_model

    ref_mod = import_reference("framework.model.deeplabv2_proda")
    torch.manual_seed(0)
    tmodel = ref_mod.ResNet101(
        ref_mod.Bottleneck, [3, 4, 23, 3], 19, torch.nn.BatchNorm2d, bn_clr=True)
    path = tmp_path / "proda_full.pth"
    torch.save({"ResNet101": {"model_state": tmodel.state_dict()}}, path)

    cfg = default_config()
    cfg.MODEL.NAME = "DeepLabv2-Resnet101-ProDA"
    cfg.MODEL.LOAD = str(path)
    cfg.SCHEME.RESOLUTION = [W, H]
    model, variables = get_model(cfg, 19)
    assert model.proda_layout and model.bn_clr
    assert cfg.MODEL.MULTI_LEVEL is False  # forced off (model_handler.py:30)
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn_pretrain"]["running_mean"]),
        tmodel.bn_pretrain.running_mean.numpy())
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(variables["params"]["layer5"]["head_conv"]["kernel"]),
                    (3, 2, 0, 1), (0, 1, 2, 3)),
        tmodel.layer5.head[1].weight.detach().numpy())
