"""Smoke tests for the ADVENT and PROTO_ADVENT fused steps (tiny model)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.config import cfg_from_file, default_config

B, H, W, C = 2, 32, 64, 19


def make_cfg(method):
    cfg = cfg_from_file("configs/advent.yml" if method == "ADVENT" else "configs/proto_advent.yml",
                        default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    spec = cfg.METHOD.ADAPTATION[method]
    spec.LOAD_PROTO = None
    spec.set_ = "test"
    cfg.OTHERS.SNAPSHOT_DIR = "/tmp/onda_test_adv"
    return cfg, spec


def tiny_model(multi_level):
    from onda_tpu.models import build_deeplab_v2

    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1), multi_level=multi_level)
    variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    return model, variables


@pytest.mark.slow
def test_advent_step():
    from onda_tpu.methods.advent import AdventAdapter

    cfg, spec = make_cfg("ADVENT")
    cfg.MODEL.MULTI_LEVEL = True  # aux head + aux discriminator path
    model, variables = tiny_model(multi_level=True)
    ad = AdventAdapter(model, variables, cfg, spec, num_classes=C)
    rng = np.random.default_rng(0)
    img = lambda: jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, C, size=(B, H, W)).astype(np.int32))
    step = ad.step_fn()
    d0 = np.asarray(jax.tree.leaves(ad.state.d_main_params)[0])
    state2, logs = step(ad.state, img(), lbl, img(),
                        jnp.asarray(1e-4, jnp.float32), jnp.asarray(1e-4, jnp.float32))
    ad.state = state2
    for key in ("Discriminator loss", "Segmentation loss", "Adversarial loss"):
        assert np.isfinite(float(logs[key])), key
    d1 = np.asarray(jax.tree.leaves(state2.d_main_params)[0])
    assert not np.allclose(d0, d1)  # discriminator trained


@pytest.mark.slow
def test_proto_advent_step():
    from onda_tpu.methods.proto_advent import ProtoAdventAdapter

    cfg, spec = make_cfg("PROTO_ADVENT")
    model, variables = tiny_model(multi_level=False)
    ad = ProtoAdventAdapter(model, variables, cfg, spec, num_classes=C)
    rng = np.random.default_rng(0)

    class OneBatch:
        def __iter__(self):
            return iter([{
                "image": rng.normal(size=(B, H, W, 3)).astype(np.float32),
                "label": rng.integers(0, C, size=(B, H, W)).astype(np.int32),
            }])

    ad.cfg_spec.STARTING_PROTO = "source"
    ad.calculate_prototypes(OneBatch())
    step = ad._build_pa_step()
    img = lambda: jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, C, size=(B, H, W)).astype(np.int32))
    state2, d2, logs = step(ad.state, ad.d_state, img(), lbl, img(),
                            jnp.asarray(1e-4, jnp.float32), jnp.asarray(1e-4, jnp.float32))
    for key in ("Discriminator loss", "Segmentation loss", "Adversarial loss",
                "Total target loss", "pseudolabel_pixel_num"):
        assert np.isfinite(float(logs[key])), key
    assert int(state2.step) == 1
