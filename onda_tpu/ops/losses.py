"""Segmentation / adaptation losses as pure jnp functions.

Numerics mirror the reference formulas exactly (golden-tested against the torch
implementation on tiny tensors):

* cross_entropy_2d       — reference framework/utils/loss.py:16-45
* rce (reverse CE)       — reference framework/utils/loss.py:88-112
* js_divergence          — reference framework/utils/loss.py:62-85
* entropy_loss           — reference framework/utils/loss.py:48-56
* regular_loss (MRENT/MRKLD) — reference methods/prototypes.py:29-39
* prob_2_entropy / bce   — reference framework/utils/func.py:28-32,71-74
* ewc_loss               — reference framework/utils/ewc.py:47-54

Layout convention: this framework is NHWC (TPU-native); predictions are
``(N, H, W, C)`` logits and hard labels are ``(N, H, W)`` int with 255 = ignore.
The reference is NCHW; tests transpose when comparing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


IGNORE = 255


def _valid_mask(target: jnp.ndarray) -> jnp.ndarray:
    """(target >= 0) & (target != 255), float. Reference loss.py:36."""
    return ((target >= 0) & (target != IGNORE)).astype(jnp.float32)


def cross_entropy_2d(logits: jnp.ndarray, target: jnp.ndarray, soft: bool = False) -> jnp.ndarray:
    """Masked mean CE over valid pixels (reference loss.py:16-45).

    logits: (N, H, W, C). Hard mode: target (N, H, W) int, mean CE over pixels with
    label in [0, C) excluding 255. Soft mode: target (N, H, W, C) "probabilities";
    the reference computes CXE = -(target*log(pred+1e-6)).sum(C).mean() directly on
    RAW LOGITS (loss.py:12-13) — and, crucially, every reference CE call funnels
    through loss_calc, which casts the target with `.long()` BEFORE CXE
    (reference func.py:35-42). Soft probabilities truncate to 0 (exactly-1.0 → 1),
    so upstream the soft-CE term has a nan VALUE (0·log(negative logit) = nan in
    the logged ce/sym/total) but contributes ZERO gradient (d[t·log(x)]/dx = t/x
    with t = 0): under SOFT_LABELS the CE term is silently inert and only RCE &
    regularizers train the model. Preserved bit-for-bit — the reference's tuned
    SOFT_LABELS behavior (and our step-trajectory parity vs its assembled
    classes, tests/test_ref_step_parity.py) depends on it.
    """
    if soft:
        t = jnp.trunc(target)  # torch .long() truncation, func.py:41
        return -(t * jnp.log(logits + 1e-6)).sum(axis=-1).mean()
    mask = _valid_mask(target)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tclip = jnp.clip(target, 0, logits.shape[-1] - 1).astype(jnp.int32)
    picked = jnp.take_along_axis(logp, tclip[..., None], axis=-1)[..., 0]
    total = -(picked * mask).sum()
    count = mask.sum()
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def entropy_loss(probs: jnp.ndarray) -> jnp.ndarray:
    """Normalized entropy of probability maps (reference loss.py:48-56).

    probs: (N, H, W, C) probabilities. Returns -sum(p*log2(p+1e-30)) / (N*H*W*log2(C)).
    """
    n, h, w, c = probs.shape
    return -jnp.sum(probs * jnp.log2(probs + 1e-30)) / (n * h * w * jnp.log2(float(c)))


def _clamped_one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot with 255→dropped row, clamped to [1e-4, 1] (reference loss.py:100-106)."""
    lbl = jnp.where(labels == IGNORE, num_classes, labels).astype(jnp.int32)
    one_hot = jax.nn.one_hot(lbl, num_classes + 1, dtype=jnp.float32)[..., :-1]
    return jnp.clip(one_hot, 1e-4, 1.0)


def rce(logits: jnp.ndarray, labels: jnp.ndarray, soft: bool = False) -> jnp.ndarray:
    """Reverse cross-entropy (reference loss.py:88-112).

    logits: (N, H, W, C). Hard: labels (N, H, W); -(sum(p*log(onehot_clamped)) * mask).sum()
    / (mask.sum()+1e-6). Soft: labels (N, H, W, C); -(sum(p*log(labels+1e-6))).sum() / (N*H*W).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    n, h, w, c = logits.shape
    if soft:
        return -(probs * jnp.log(labels + 1e-6)).sum() / (n * h * w)
    mask = _valid_mask(labels)
    one_hot = _clamped_one_hot(labels, c)
    return -((probs * jnp.log(one_hot)).sum(axis=-1) * mask).sum() / (mask.sum() + 1e-6)


def js_divergence(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Jensen–Shannon divergence vs hard labels (reference loss.py:62-85).

    logits (N, H, W, C); labels (N, H, W) with 255 ignore. Mirrors the reference:
    predictions are masked (zeroed on ignore pixels), the one-hot is clamped but NOT
    masked, and the final value is scaled by N*H*W / mask.sum().
    """
    probs = jax.nn.softmax(logits, axis=-1)
    n, h, w, c = logits.shape
    mask = _valid_mask(labels)
    mpred = probs * mask[..., None]
    one_hot = _clamped_one_hot(labels, c)
    per = (
        entropy_loss((one_hot + mpred) / 2.0)
        - (entropy_loss(one_hot) + entropy_loss(mpred)) / 2.0
    )
    return per * n * h * w / mask.sum()


def regular_loss(regularizer: str, logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy-family regularizers on student logits (reference methods/prototypes.py:29-39).

    MRENT: (p * log p).sum() / (N*H*W);  MRKLD: -log p.sum() / (N*C*H*W).
    logits: (N, H, W, C).
    """
    n, h, w, c = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    if regularizer == "MRENT":
        p = jax.nn.softmax(logits, axis=-1)
        return (p * logp).sum() / (n * h * w)
    if regularizer == "MRKLD":
        return -logp.sum() / (n * c * h * w)
    return jnp.zeros(())


def prob_2_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Weighted self-information maps (reference func.py:71-74). probs: (N, H, W, C)."""
    c = probs.shape[-1]
    return -probs * jnp.log2(probs + 1e-30) / jnp.log2(float(c))


def bce_with_logits(logits: jnp.ndarray, label: float) -> jnp.ndarray:
    """Mean BCE-with-logits against a constant label map (reference func.py:28-32)."""
    target = jnp.full_like(logits, label)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def ewc_loss(lamda: float, anchor_params, current_params, fishers=None) -> jnp.ndarray:
    """EWC-style weight anchoring (reference ewc.py:47-54).

    `fishers=None` is the live path's unit Fisher (the reference calls
    `ewc_loss(..., fishers=1)` implicitly); pass a pytree from
    :func:`compute_fisher` for true diagonal-Fisher anchoring."""
    if fishers is None:
        sq = jax.tree.map(lambda a, b: jnp.sum((a - b) ** 2), anchor_params, current_params)
    else:
        sq = jax.tree.map(
            lambda f, a, b: jnp.sum(f * (a - b) ** 2), fishers, anchor_params, current_params
        )
    return lamda / 2.0 * jax.tree.reduce(jnp.add, sq, jnp.zeros(()))


def compute_fisher(logit_fn, params, images, labels) -> "jax.Array":
    """Diagonal Fisher information: squared gradient of the mean log-likelihood
    (reference ewc.py:15-41 — the reference's "mean of loglikelihoods" variant,
    which is what its compute_fisher actually executes).

    `logit_fn(params, images) -> (N, ..., C)` logits; `labels` integer class ids
    broadcastable to the logits' leading dims. Returns a pytree shaped like
    `params` with per-parameter squared gradients. 255-labels are ignored.
    """

    def mean_loglik(p):
        logp = jax.nn.log_softmax(logit_fn(p, images).astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(
            logp, jnp.clip(labels, 0, logp.shape[-1] - 1)[..., None], axis=-1
        )[..., 0]
        valid = (labels != 255).astype(jnp.float32)
        return jnp.sum(picked * valid) / jnp.maximum(valid.sum(), 1.0)

    grads = jax.grad(mean_loglik)(params)
    return jax.tree.map(jnp.square, grads)
