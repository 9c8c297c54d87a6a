"""Shape/finiteness smoke tests for the DeepLab-v3(+) zoo (reference-dead code,
provided for capability parity — SURVEY.md §2.13)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.models.deeplabv3 import build_deeplab_v3


@pytest.mark.slow
@pytest.mark.parametrize("backbone,plus", [("resnet50", True), ("mobilenetv2", False)])
def test_v3_shapes(backbone, plus):
    model = build_deeplab_v3(num_classes=19, backbone=backbone, plus=plus)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    _, out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    assert out["out"].shape == (1, 64, 128, 19)
    assert np.isfinite(np.asarray(out["out"])).all()
