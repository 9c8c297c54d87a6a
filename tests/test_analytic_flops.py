"""bench.py's analytic MFU denominator: the jaxpr matmul/conv FLOP walker.

Round-3 verdict weak #4: the post-optimization HLO cost model drifted ±4%
across recompiles of the same program, making the headline MFU a band. The
analytic count is deterministic given the traced program; these tests pin its
arithmetic against hand counts (including the container-primitive rules:
cond = max over branches, scan = length×body, pjit recursion).
"""

import jax
import jax.numpy as jnp

from bench import _analytic_flops


def flops_of(fn, *args):
    return _analytic_flops(jax.make_jaxpr(fn)(*args))


def test_matmul_exact():
    a, b = jnp.zeros((128, 256)), jnp.zeros((256, 64))
    assert flops_of(jax.jit(lambda a, b: a @ b), a, b) == 2 * 128 * 256 * 64


def test_conv_exact():
    x, k = jnp.zeros((2, 16, 16, 8)), jnp.zeros((3, 3, 8, 32))
    conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    assert flops_of(conv, x, k) == 2 * (2 * 16 * 16 * 32) * (3 * 3 * 8)


def test_grad_counts_backward_convs():
    # grad w.r.t. the kernel adds exactly one conv (dk); dx is not computed
    x, k = jnp.zeros((2, 16, 16, 8)), jnp.zeros((3, 3, 8, 32))

    def loss(k, x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    fwd = 2 * (2 * 16 * 16 * 32) * (3 * 3 * 8)
    # dk conv: output is the kernel (3·3·8·32), contraction over batch·H·W
    dk = 2 * (3 * 3 * 8 * 32) * (2 * 16 * 16)
    assert flops_of(jax.jit(jax.value_and_grad(loss)), k, x) == fwd + dk


def test_cond_modes_bracket_the_branch():
    x = jnp.zeros((64, 64))

    def g(x, p):
        return jax.lax.cond(p, lambda v: v @ v, lambda v: v, x)

    jx = jax.make_jaxpr(g)(x, True)
    from bench import _analytic_flops

    assert _analytic_flops(jx, cond_mode="min") == 0  # cheap branch executes
    assert _analytic_flops(jx, cond_mode="max") == 2 * 64 ** 3  # hot path


def test_scan_multiplies_by_length():
    x = jnp.zeros((64, 64))

    def s(x):
        return jax.lax.scan(lambda c, _: (c @ c, None), x, None, length=5)[0]

    assert flops_of(s, x) == 5 * 2 * 64 ** 3
