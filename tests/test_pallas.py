"""Pallas fused pseudo-label kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from onda_tpu.ops import prototypes as P
from onda_tpu.ops.pallas_kernels import fused_pseudo_labels


def test_fused_pseudo_labels_matches_jnp(rng):
    C, F, PIX = 19, 256, 700  # non-multiple of the tile size exercises padding
    feat = rng.normal(size=(PIX, F)).astype(np.float32)
    protos = rng.normal(size=(C, F)).astype(np.float32)
    prior = rng.random(size=(PIX, C)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    tau = jnp.asarray(1.3, jnp.float32)

    state = P.init_state(C, F).replace(mean=jnp.asarray(protos), tau=tau)
    dis = P.distances(jnp.asarray(feat), state, "euclidean")
    want_soft = np.asarray(P.fuse_prior(P.proto_probs(dis, tau), jnp.asarray(prior)))
    want_hard = np.asarray(P.hard_labels(jnp.asarray(want_soft), 0.3))

    soft, hard = fused_pseudo_labels(
        jnp.asarray(feat), jnp.asarray(protos), jnp.asarray(prior), tau,
        num_classes=C, thresh=0.3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(soft), want_soft, rtol=1e-4, atol=1e-5)
    agree = (np.asarray(hard) == want_hard).mean()
    assert agree > 0.999  # ties at the threshold may flip


def test_bn_batch_stats_matches_reduce(rng):
    """The (rejected-for-production, kept-as-documentation) Pallas BN-stats
    kernel computes the exact `_bn_train_math` statistics; exercises channel
    padding (C=24 -> 128 lanes) and row padding (P not a tile multiple)."""
    from onda_tpu.models.layers import _bn_train_math
    from onda_tpu.ops.pallas_kernels import bn_batch_stats

    x = jnp.asarray(rng.normal(size=(3, 17, 32, 24)), jnp.float32)
    mean, var = bn_batch_stats(x, interpret=True)
    _, want_mean, want_var, _ = _bn_train_math(
        x, jnp.ones((24,)), jnp.zeros((24,)), 1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean), atol=1e-6)
    # accumulation order differs (chunked partial sums) -> f32 rounding noise
    np.testing.assert_allclose(np.asarray(var), np.asarray(want_var),
                               rtol=1e-5, atol=1e-6)
