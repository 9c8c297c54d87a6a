"""Golden tests: matmul-based resize vs torch Upsample / F.interpolate."""

import numpy as np
import pytest
import jax.numpy as jnp

import jax

from onda_tpu.ops import interp as _interp

upsample_bilinear_ac = jax.jit(_interp.upsample_bilinear_ac, static_argnames="out_hw")
resize_nearest = jax.jit(_interp.resize_nearest, static_argnames="out_hw")

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [((9, 17), (64, 128)), ((5, 5), (40, 40)), ((8, 8), (8, 8))])
def test_bilinear_align_corners(rng, in_hw, out_hw):
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    want = (
        torch.nn.Upsample(size=out_hw, mode="bilinear", align_corners=True)(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        )
        .numpy()
    )
    got = np.moveaxis(np.asarray(upsample_bilinear_ac(jnp.asarray(x), out_hw)), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 128), (9, 17)), ((33, 65), (5, 9))])
def test_nearest_downsample(rng, in_hw, out_hw):
    lbl = rng.integers(0, 20, size=(2, *in_hw)).astype(np.float32)
    want = (
        torch.nn.functional.interpolate(torch.from_numpy(lbl).unsqueeze(1), size=out_hw)
        .squeeze(1)
        .numpy()
    )
    got = np.asarray(resize_nearest(jnp.asarray(lbl), out_hw))
    np.testing.assert_array_equal(got, want)
