"""Pallas TPU kernels for the prototype pseudo-label hot path.

Fuses the per-pixel pipeline of SURVEY.md §3.2 ("HOT KERNEL", reference
prototype_handler.py:140-166) into one VMEM-resident pass per pixel tile:

    distances (MXU matmul vs prototypes) → min-subtract → softmax(-d/τ)
    → × teacher prior → renormalize → [soft probs, thresholded hard labels]

Layout: pixels tiled along the sublane axis (TILE_P rows); the class axis is
padded to 128 lanes (C=19 → one lane tile). Prototypes (C, F) stay resident in
VMEM across the whole grid. Everything is one `pallas_call`, so the distance
matrix never round-trips to HBM.

The jnp reference implementation in ops/prototypes.py is the production path:
XLA's fusion of it measured ~0.6 ms at C=19, so the kernel is NOT wired into
the fused step — it is kept as measured infrastructure (usable directly via
`fused_pseudo_labels`, e.g. for future large-C variants) and is bit-compared
against the jnp path in tests/test_pallas.py.
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


# ---------------------------------------------------------------------------
# Train-mode BatchNorm batch statistics: per-channel (sum, sum-of-squares).
#
# The fused step's profile attributes ~16% to XLA's "convert+reduce" fusions —
# BN batch statistics in f32 over bf16 activations (docs/PERFORMANCE.md). XLA's
# reduction over the major (N,H,W) axes of an NHWC activation sustains only
# ~250-290 GB/s on a v5e chip while elementwise read+write passes over the same
# data reach ~500-560 GB/s, so this kernel was built to close that gap by
# reading each tile once and accumulating both moments in VMEM.
#
# MEASURED RESULT (tools/bench_bn.py, v5e): it does NOT close the gap —
# 175-335 GB/s, i.e. the XLA reduce already sits at the hardware's practical
# envelope for this access pattern. Every reformulation plateaus at the same
# wall (variadic one-pass lax.reduce, chunked (8,C) VPU accumulation at several
# tile sizes, and an MXU per-128-block Gram-diagonal that trades the VPU
# multiply-adds for matmul flops): the limit is reduction-issue throughput,
# not HBM bandwidth. Kept, with the microbenchmark, as documentation of the
# measured frontier; the jnp `_bn_train_math` stays the production path.
# ---------------------------------------------------------------------------

_STATS_SUBLANES = 8


def _bn_stats_kernel(x_ref, sum_ref, sq_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    t, c = x_ref.shape
    k = _STATS_SUBLANES

    def body(i, carry):
        s, ss = carry
        chunk = x_ref[pl.ds(i * k, k), :].astype(jnp.float32)  # (8, C): VPU-native
        return s + chunk, ss + chunk * chunk

    zero = jnp.zeros((k, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, t // k, body, (zero, zero))
    sum_ref[:] += s
    sq_ref[:] += ss


@partial(jax.jit, static_argnames=("interpret",))
def bn_batch_stats(x, interpret: bool = False):
    """Per-channel (mean, biased var) of an (..., C) activation, one HBM pass.

    Semantics of `_bn_train_math`'s statistics (models/layers.py): f32
    accumulation over bf16 (or f32) input, var = max(E[x²] − E[x]², 0).
    """
    c = x.shape[-1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    y = x.reshape(n, c)
    pad_c = (-c) % LANES
    if pad_c:  # zero channels contribute zero moments; sliced off at the end
        y = jnp.pad(y, ((0, 0), (0, pad_c)))
    cp = c + pad_c
    # ~4 MB tiles (double-buffered by the grid pipeline), sublane-aligned
    bytes_per_row = cp * y.dtype.itemsize
    tile = max(_STATS_SUBLANES * 16, min(1 << 21, n * bytes_per_row) // bytes_per_row)
    tile -= tile % (_STATS_SUBLANES * 16)
    pad_p = (-n) % tile
    if pad_p:  # zero rows are moment-neutral too
        y = jnp.pad(y, ((0, pad_p), (0, 0)))
    grid = (y.shape[0] // tile,)
    s, ss = pl.pallas_call(
        _bn_stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((_STATS_SUBLANES, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATS_SUBLANES, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_STATS_SUBLANES, cp), jnp.float32),
            jax.ShapeDtypeStruct((_STATS_SUBLANES, cp), jnp.float32),
        ),
        interpret=interpret,
    )(y)
    mean = s.sum(axis=0)[:c] / n
    mean_sq = ss.sum(axis=0)[:c] / n
    return mean, jnp.maximum(mean_sq - mean * mean, 0.0)
