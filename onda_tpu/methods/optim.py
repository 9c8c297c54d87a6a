"""SGD with torch semantics, two LR groups, and a frozen-parameter mask.

The reference trains with `optim.SGD(model.optim_parameters(lr), momentum, wd)`
where the backbone (minus frozen BN affine params) and the classifier heads form
two param groups whose LRs are rewritten every step as
`lr_poly(base, step, total, power) * ratio[g]` with LR_RATIO "a:b"
(reference methods/adaptation_model.py:88-125; deeplabv2.py:397-439).

Torch SGD update (dampening 0, no nesterov):
    g ← g + wd·p;  buf ← μ·buf + g;  p ← p − lr·buf

Implemented as pure pytree functions so the update fuses into the jitted step.
Frozen leaves (backbone BatchNorm scale/bias when norm_grad=False, reference
deeplabv2.py:25-48) receive no update and no momentum accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BACKBONE, HEAD, FROZEN = 0, 1, 2


def label_params(params, frozen_bn: bool = True):
    """Leaf → group id (BACKBONE / HEAD / FROZEN) from the module path."""

    def label_one(path):
        names = [p.key for p in path]
        if any(n in ("layer5", "layer6") for n in names):
            return HEAD
        is_bn_affine = any("bn" in n or n == "downsample_bn" for n in names) and names[-1] in (
            "scale",
            "bias",
        )
        if frozen_bn and is_bn_affine:
            return FROZEN
        return BACKBONE

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = [label_one(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), labels)


def init(params):
    return jax.tree.map(jnp.zeros_like, params)


def lr_poly(base_lr: float, step, total_steps: int, power: float):
    """Poly LR (reference utils/func.py:45-47); POWER 0 ⇒ constant."""
    if power == 0:
        return jnp.asarray(base_lr, jnp.float32)
    return base_lr * (1.0 - step / total_steps) ** power


def update(params, grads, momentum_buf, labels, lr_backbone, lr_head, momentum, weight_decay):
    """One SGD step; returns (new_params, new_momentum_buf)."""

    def upd(p, g, b, lab):
        if lab == FROZEN:
            return p, b
        lr = lr_backbone if lab == BACKBONE else lr_head
        g = g + weight_decay * p
        b_new = momentum * b + g
        return p - lr * b_new, b_new

    out = jax.tree.map(upd, params, grads, momentum_buf, labels)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_buf


# --- Adam (for ADVENT discriminators, reference advent_da.py:55-60) -----------


def adam_init(params):
    return {
        "mu": jax.tree.map(jnp.zeros_like, params),
        "nu": jax.tree.map(jnp.zeros_like, params),
        "count": jnp.zeros((), jnp.int32),
    }


def adam_update(params, grads, opt_state, lr, b1=0.9, b2=0.99, eps=1e-8):
    """torch.optim.Adam parity (betas (0.9, 0.99) per the reference)."""
    count = opt_state["count"] + 1
    t = count.astype(jnp.float32)

    def upd(p, g, m, v):
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        m_hat = m_new / (1 - b1**t)
        v_hat = v_new / (1 - b2**t)
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps), m_new, v_new

    out = jax.tree.map(upd, params, grads, opt_state["mu"], opt_state["nu"])
    pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
    return pick(0), {"mu": pick(1), "nu": pick(2), "count": count}
