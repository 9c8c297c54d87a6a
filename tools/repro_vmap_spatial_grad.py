"""Minimal repro: GSPMD miscompiles the backward of a vmapped conv when the
input is sharded over BOTH a batch and a spatial mesh axis.

Observed on jax 0.9.0 (XLA:CPU with --xla_force_host_platform_device_count=8,
virtual 2x4 ("data","spatial") mesh): the kernel gradients of convolutions
under `jax.vmap` (weights closed over, i.e. shared across the vmapped axis)
come out multiplied EXACTLY by the size of the data axis (2 on a 2x4 mesh,
4 on a 4x2 mesh; shape-dependent — a tiny-batch single-conv shape came out
right once, every multi-conv shape we tried is wrong). Any one of these makes
it correct:

  * a 1-D mesh (spatial-only, or data-only);
  * input sharded over the batch axis only (spatial dim replicated);
  * no vmap (unrolled per-slice calls, stacked).

This bug is why onda_tpu's merged source+target gradient pass defaults to the
UNROLLED formulation (ONDA_MERGE_STYLE=unroll, onda_tpu/methods/proto_online.py)
instead of the vmap one: the fused adaptation step trains with exactly-doubled
backbone gradients on a data x spatial mesh otherwise. Caught by the sharded ==
unsharded equality assertions in __graft_entry__.dryrun_multichip (round-2
verdict weak #3: "finite is not enough").

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/repro_vmap_spatial_grad.py
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    rng = np.random.default_rng(0)
    S, B, H, W, C = 2, 4, 32, 8, 4  # B divisible by every data-axis size below
    x_np = rng.normal(size=(S, B, H, W, C)).astype(np.float32)
    ks_np = [(rng.normal(size=(3, 3, C, C)) * 0.1).astype(np.float32) for _ in range(2)]

    def loss_chain(ks, xs):  # two chained convs -> WRONG under 2-D sharding
        outs = jax.vmap(lambda x: conv(conv(x, ks[0]), ks[1]))(xs)
        return (outs.astype(jnp.float32) ** 2).mean()

    def loss_single(ks, xs):  # one conv -> correct
        outs = jax.vmap(lambda x: conv(x, ks[0]))(xs)
        return (outs.astype(jnp.float32) ** 2).mean()

    def loss_unrolled(ks, xs):  # chain without vmap -> correct
        outs = jnp.stack([conv(conv(xs[s], ks[0]), ks[1]) for s in range(S)])
        return (outs.astype(jnp.float32) ** 2).mean()

    cases = [
        ("chain, 2x4 data x spatial", loss_chain, (2, 4), P(None, "data", "spatial")),
        ("chain, 4x2 data x spatial", loss_chain, (4, 2), P(None, "data", "spatial")),
        ("chain, spatial-only 1-D", loss_chain, (8,), P(None, None, "spatial")),
        ("chain, batch-only on 2-D", loss_chain, (2, 4), P(None, "data", None)),
        ("single conv, 2x4", loss_single, (2, 4), P(None, "data", "spatial")),
        ("unrolled chain, 2x4", loss_unrolled, (2, 4), P(None, "data", "spatial")),
    ]
    n_dev = len(jax.devices())
    assert n_dev >= 8, "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    for name, fn, shape, spec in cases:
        axes = ("data", "spatial") if len(shape) == 2 else ("spatial",)
        mesh = Mesh(np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape), axes)
        g_ref = jax.jit(jax.grad(fn))([jnp.asarray(k) for k in ks_np], jnp.asarray(x_np))
        ks = jax.device_put(ks_np, NamedSharding(mesh, P()))
        xs = jax.device_put(x_np, NamedSharding(mesh, spec))
        g_sh = jax.jit(jax.grad(fn))(ks, xs)
        ratio = float(jnp.linalg.norm(g_sh[0]) / jnp.linalg.norm(g_ref[0]))
        ok = "ok" if abs(ratio - 1) < 1e-3 else "WRONG"
        print(f"{name:32s} |g_sharded|/|g_unsharded| = {ratio:.4f}  {ok}")


if __name__ == "__main__":
    main()
