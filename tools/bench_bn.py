#!/usr/bin/env python
"""Microbenchmark: train-mode BatchNorm statistics alternatives on TPU.

The step profile attributes ~16% of the fused step to "convert+reduce"
fusions — BN batch statistics in f32 over bf16 activations (see
docs/PERFORMANCE.md). A bandwidth-bound two-pass BN forward (one read for
stats, one read + one write for the apply) should cost ~3 bytes/elem of HBM
traffic; this tool measures what the current formulation actually achieves on
representative DeepLab-v2 activation shapes and compares reformulations:

  two_reduce   - current `_bn_train_math` (mean + mean-of-squares, separate
                 jnp reductions; XLA multi-output-fuses them)
  variadic     - lax.reduce with a (sum, sumsq) pair: one pass by construction
  dot_stats    - sums via dot products (MXU instead of VPU reductions)
  apply_only   - normalization apply with precomputed stats (lower bound for
                 the second pass)
  full         - stats + apply (what one BN layer in a teacher forward costs)

Run on the real chip: `python tools/bench_bn.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax is pre-imported at interpreter startup on this box; route the cache
# settings through jax.config (see onda_tpu/utils/compile_cache.py)
from onda_tpu.utils import compile_cache

compile_cache.enable("/root/.cache/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

EPS = 1e-5


def two_reduce(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(0, 1, 2))
    mean_sq = (x32 * x32).mean(axis=(0, 1, 2))
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    return mean, var


def variadic(x, scale, bias):
    x32 = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s, ss = lax.reduce(
        (x32, x32 * x32), (jnp.float32(0), jnp.float32(0)),
        lambda a, b: (a[0] + b[0], a[1] + b[1]), (0, 1, 2),
    )
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    return mean, var


def dot_stats(x, scale, bias):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    y = x.reshape(n, x.shape[-1])
    ones = jnp.ones((n,), jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    s = jax.lax.dot_general(ones, y, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ss = jax.lax.dot_general(y, y, (((0,), (0,)), ((1,), (1,))),
                             preferred_element_type=jnp.float32)  # per-channel <x,x>
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    return mean, var


def reshape2d(x, scale, bias):
    p = x.shape[0] * x.shape[1] * x.shape[2]
    y = x.reshape(p, x.shape[-1]).astype(jnp.float32)
    mean = y.mean(axis=0)
    mean_sq = (y * y).mean(axis=0)
    return mean, jnp.maximum(mean_sq - mean * mean, 0.0)


def two_stage(x, scale, bias):
    # chunked partial sums: (K, p, C) -> (K, C) -> (C,)
    p = x.shape[0] * x.shape[1] * x.shape[2]
    k = 64
    y = x.reshape(k, p // k, x.shape[-1]).astype(jnp.float32)
    s = y.sum(axis=1).sum(axis=0)
    ss = (y * y).sum(axis=1).sum(axis=0)
    mean = s / p
    return mean, jnp.maximum(ss / p - mean * mean, 0.0)


def bf16_reduce(x, scale, bias):
    # reduce in bf16 input without pre-convert; accumulate f32 via dtype arg
    mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    mean_sq = jnp.mean(x.astype(jnp.float32) ** 2, axis=(0, 1, 2))
    return mean, jnp.maximum(mean_sq - mean * mean, 0.0)


def gram_stats(x, scale, bias):
    # MXU trick: the VPU-bound sumsq becomes per-128-block Gram diagonals on
    # the MXU (~200x the flops budget of the VPU); sum rides a ones-dot.
    p = x.shape[0] * x.shape[1] * x.shape[2]
    c = x.shape[-1]
    y = x.reshape(p, c // 128, 128)
    g = jnp.einsum('pbc,pbd->bcd', y, y, preferred_element_type=jnp.float32)
    ss = jnp.diagonal(g, axis1=1, axis2=2).reshape(c)
    ones = jnp.ones((p,), x.dtype)
    s = jnp.einsum('p,pbc->bc', ones, y, preferred_element_type=jnp.float32).reshape(c)
    mean = s / p
    return mean, jnp.maximum(ss / p - mean * mean, 0.0)


def pallas_stats(x, scale, bias):
    from onda_tpu.ops.pallas_kernels import bn_batch_stats
    return bn_batch_stats(x)


def apply_only(x, mean, var, scale, bias):
    inv = lax.rsqrt(var + EPS) * scale
    return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


def full(x, scale, bias):
    mean, var = two_reduce(x, scale, bias)
    return apply_only(x, mean, var, scale, bias)


def timed(fn, x, *args, iters=100):
    # tunneled-chip quirks (CLAUDE.md): per-dispatch latency ~2 ms and
    # block_until_ready unreliable — run the whole iteration loop on-device
    # (each iteration data-dependent on the last) and materialize one scalar.
    @jax.jit
    def loop(x, *args):
        def body(_, x):
            out = fn(x, *args)
            leaf = jax.tree.leaves(out)[0]
            return x + leaf.reshape(-1)[0].astype(x.dtype) * 0

        x = lax.fori_loop(0, iters, body, x)
        return x.reshape(-1)[0].astype(jnp.float32)

    float(loop(x, *args))
    t0 = time.perf_counter()
    n_calls = 3
    for _ in range(n_calls):
        s = loop(x, *args)
    float(s)
    return (time.perf_counter() - t0) / (iters * n_calls)


def main():
    # representative (N,H,W,C) activations for R50 @ 512x1024 stride-8, b8
    shapes = [
        (8, 128, 256, 256),   # layer1 out
        (8, 64, 128, 512),    # layer2 out
        (8, 64, 128, 1024),   # layer3 out (dilated)
        (8, 64, 128, 2048),   # layer4 out (dilated)
    ]
    print(f"# platform={jax.devices()[0].platform}")
    for shape in shapes:
        n_bytes = int(np.prod(shape)) * 2  # bf16
        x = jax.device_put(
            jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.bfloat16))
        scale = jnp.ones((shape[-1],), jnp.float32)
        bias = jnp.zeros((shape[-1],), jnp.float32)
        mean, var = jax.jit(two_reduce)(x, scale, bias)
        rows = {
            "two_reduce": timed(two_reduce, x, scale, bias),
            "variadic": timed(variadic, x, scale, bias),
            "dot_stats": timed(dot_stats, x, scale, bias),
            "reshape2d": timed(reshape2d, x, scale, bias),
            "two_stage": timed(two_stage, x, scale, bias),
            "bf16_reduce": timed(bf16_reduce, x, scale, bias),
            "pallas_stats": timed(pallas_stats, x, scale, bias),
            "gram_stats": timed(gram_stats, x, scale, bias),
            "apply_only": timed(lambda x, s, b: apply_only(x, mean, var, s, b), x, scale, bias),
            "full": timed(full, x, scale, bias),
        }
        print(f"shape={shape} ({n_bytes/1e6:.0f} MB bf16)")
        for k, dt in rows.items():
            passes = {"apply_only": 2, "full": 3}.get(k, 1)  # HBM touches
            bw = n_bytes * passes / dt / 1e9
            print(f"  {k:11s} {dt*1e3:7.3f} ms   {bw:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
