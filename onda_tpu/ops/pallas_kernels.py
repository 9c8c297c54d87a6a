"""Pallas TPU kernels for the prototype pseudo-label hot path.

Fuses the per-pixel pipeline of SURVEY.md §3.2 ("HOT KERNEL", reference
prototype_handler.py:140-166) into one VMEM-resident pass per pixel tile:

    distances (MXU matmul vs prototypes) → min-subtract → softmax(-d/τ)
    → × teacher prior → renormalize → [soft probs, thresholded hard labels]

Layout: pixels tiled along the sublane axis (TILE_P rows); the class axis is
padded to 128 lanes (C=19 → one lane tile). Prototypes (C, F) stay resident in
VMEM across the whole grid. Everything is one `pallas_call`, so the distance
matrix never round-trips to HBM.

The jnp reference implementation in ops/prototypes.py remains the default (XLA
already fuses this path well at C=19); the kernel is the `fused_pseudo_labels`
entry used when ONDA_PALLAS=1, and is bit-compared against the jnp path in
tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_P = 512


def _kernel(tau_ref, feat_ref, protos_ref, p2_ref, prior_ref, soft_ref, hard_ref,
            *, num_classes: int, thresh: float):
    feat = feat_ref[:]                       # (TILE_P, F) f32
    protos_t = protos_ref[:]                 # (F, LANES) f32 (padded cols)
    prior = prior_ref[:]                     # (TILE_P, LANES)
    tau = tau_ref[0, 0]

    col = jax.lax.broadcasted_iota(jnp.int32, (feat.shape[0], LANES), 1)
    valid = col < num_classes

    f2 = (feat * feat).sum(axis=1, keepdims=True)            # (TILE_P, 1)
    cross = jnp.dot(feat, protos_t, preferred_element_type=jnp.float32)
    d = jnp.sqrt(jnp.maximum(f2 - 2.0 * cross + p2_ref[:], 0.0))
    d = jnp.where(valid, d, jnp.inf)
    dmin = d.min(axis=1, keepdims=True)                      # per-pixel min subtract
    e = jnp.where(valid, jnp.exp(-(d - dmin) / tau), 0.0)
    prop = e / e.sum(axis=1, keepdims=True)
    fused = prop * jnp.where(valid, prior, 0.0)
    fused = fused / fused.sum(axis=1, keepdims=True)
    soft_ref[:] = fused
    mx = fused.max(axis=1, keepdims=True)
    arg = jnp.argmax(fused, axis=1).astype(jnp.int32)[:, None]
    hard_ref[:] = jnp.where(mx < thresh, 255, arg)


@partial(jax.jit, static_argnames=("num_classes", "thresh", "interpret"))
def fused_pseudo_labels(feat, protos, prior, tau, num_classes: int, thresh: float,
                        interpret: bool = False):
    """feat (P, F) f32; protos (C, F); prior (P, C); tau scalar.

    Returns (soft (P, C) fused probabilities, hard (P,) int32 labels with 255
    below `thresh`) — semantics of reference pseudo_labels (:140-166), with the
    distance as euclidean on pre-scaled inputs (mahalanobis = scale feat/protos
    by 1/global_std before calling, see ops/prototypes.distances).
    """
    p, f = feat.shape
    c = protos.shape[0]
    pad_p = (-p) % TILE_P
    feat_pad = jnp.pad(feat.astype(jnp.float32), ((0, pad_p), (0, 0)))
    prior_pad = jnp.pad(prior.astype(jnp.float32), ((0, pad_p), (0, LANES - c)))
    protos_t = jnp.pad(protos.astype(jnp.float32).T, ((0, 0), (0, LANES - c)))
    p2 = jnp.pad((protos.astype(jnp.float32) ** 2).sum(axis=1)[None, :], ((0, 0), (0, LANES - c)))
    tau_arr = jnp.reshape(tau.astype(jnp.float32), (1, 1))

    grid = (feat_pad.shape[0] // TILE_P,)
    soft, hard = pl.pallas_call(
        partial(_kernel, num_classes=c, thresh=float(thresh)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # tau
            pl.BlockSpec((TILE_P, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_P, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((feat_pad.shape[0], LANES), jnp.float32),
            jax.ShapeDtypeStruct((feat_pad.shape[0], 1), jnp.int32),
        ),
        interpret=interpret,
    )(tau_arr, feat_pad, protos_t, p2, prior_pad)
    return soft[:p, :c], hard[:p, 0]
