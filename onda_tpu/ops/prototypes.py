"""Class-prototype engine: running feature moments → distances → pseudo-labels.

TPU-native re-design of the reference ``prototype_handler``
(framework/domain_adaptation/methods/prototype_handler.py:8-166). The reference
builds the (P, C) distance matrix with a Python loop over classes; here everything
is batched matmul on the MXU:

    ||f_p - m_c||^2 = ||f_p||^2 - 2 f·mᵀ + ||m_c||^2

State is a small pytree (mean / squared-mean / count / tau) that lives inside the
jitted adaptation step; the ``append`` (exact running mean, reference :62-74) and
``ma`` (per-class EMA, reference :88-99) updates are order-independent per-class
sums, so under data parallelism they are psum'd across the mesh before the update
(SURVEY.md §5.8).

Shapes: feat (P, F); class scores (P, C); prototypes (C, F). C=19, F=256 for the
shipped models.
"""

from __future__ import annotations

import os
import pickle

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ProtoState:
    mean: jnp.ndarray      # (C, F) running class means
    sq_mean: jnp.ndarray   # (C, F) running class means of feat**2
    count: jnp.ndarray     # (C,)  samples seen per class
    tau: jnp.ndarray       # ()    softmax temperature (drifts, reference :148-156)


def init_state(num_classes: int, num_features: int, tau: float = 1.0) -> ProtoState:
    return ProtoState(
        mean=jnp.zeros((num_classes, num_features), jnp.float32),
        sq_mean=jnp.zeros((num_classes, num_features), jnp.float32),
        count=jnp.zeros((num_classes,), jnp.float32),
        tau=jnp.asarray(tau, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Moment gathering
# ---------------------------------------------------------------------------


def onehot_assign(scores: jnp.ndarray) -> jnp.ndarray:
    """Hard one-hot of the argmax class (reference :83-86). scores: (P, C)."""
    c = scores.shape[-1]
    return (scores.argmax(axis=-1)[..., None] == jnp.arange(c)).astype(jnp.float32)


def class_moments(feat: jnp.ndarray, onehot: jnp.ndarray):
    """Per-class feature sums — one MXU matmul (reference get_proto_array :76-81).

    Returns (vect (C, F) = onehotᵀ @ feat, sq (C, F) = onehotᵀ @ feat², sums (C,)).
    """
    vect = jnp.einsum("pc,pf->cf", onehot, feat, precision="highest", preferred_element_type=jnp.float32)
    sq = jnp.einsum("pc,pf->cf", onehot, feat * feat, precision="highest", preferred_element_type=jnp.float32)
    sums = onehot.sum(axis=0)
    return vect, sq, sums


def append(state: ProtoState, vect, sq, sums) -> ProtoState:
    """Exact running mean / mean-of-squares update (reference append :62-74)."""
    count = state.count + sums
    denom = jnp.where(count > 0, count, 1.0)
    mean = state.mean + (vect - state.mean * sums[:, None]) / denom[:, None]
    sq_mean = state.sq_mean + (sq - state.sq_mean * sums[:, None]) / denom[:, None]
    return state.replace(mean=mean, sq_mean=sq_mean, count=count)


def ma(state: ProtoState, vect, sq, sums, ma_lambda: float) -> ProtoState:
    """EMA update touching only classes present in the batch (reference ma :88-99)."""
    rev = ma_lambda ** (sums > 0).astype(jnp.float32)  # 1 for absent classes
    denom = jnp.where(sums > 0, sums, 1.0)
    mean = state.mean * rev[:, None] + (1.0 - rev)[:, None] * (vect / denom[:, None])
    sq_mean = state.sq_mean * rev[:, None] + (1.0 - rev)[:, None] * (sq / denom[:, None])
    return state.replace(mean=mean, sq_mean=sq_mean)


# ---------------------------------------------------------------------------
# Distances
# ---------------------------------------------------------------------------


def prototype_var(state: ProtoState) -> jnp.ndarray:
    """Per-class feature std (reference prototype_var :49-51)."""
    return jnp.sqrt(state.sq_mean - state.mean**2)


def global_var(state: ProtoState) -> jnp.ndarray:
    """Count-weighted global feature std across classes (reference global_var :53-60)."""
    w = state.count / state.count.sum()
    g_sq = (state.sq_mean * w[:, None]).sum(axis=0)
    g_mean = (state.mean * w[:, None]).sum(axis=0)
    return jnp.sqrt(g_sq - g_mean**2)


def distances(
    feat: jnp.ndarray, state: ProtoState, metric: str = "euclidean"
) -> jnp.ndarray:
    """(P, C) L2 distance matrix, per-pixel min subtracted (reference :111-138).

    metric "mahalanobis" divides by the global per-feature std first (diagonal
    Mahalanobis, reference :116-118); both variants subtract the per-pixel minimum
    distance for numerical stabilization (reference :124-125,137-138).
    """
    if metric == "mahalanobis":
        inv = 1.0 / global_var(state)
        feat = feat * inv[None, :]
        protos = state.mean * inv[None, :]
    elif metric == "euclidean":
        protos = state.mean
    else:
        raise ValueError(f"unknown distance metric {metric!r}")
    f2 = (feat * feat).sum(axis=-1, keepdims=True)          # (P, 1)
    p2 = (protos * protos).sum(axis=-1)[None, :]            # (1, C)
    cross = jnp.matmul(feat, protos.T, precision="highest")  # (P, C) — MXU, f32
    d = jnp.sqrt(jnp.maximum(f2 - 2.0 * cross + p2, 0.0))
    return d - d.min(axis=-1, keepdims=True)


def proto_probs(dis: jnp.ndarray, tau) -> jnp.ndarray:
    """softmax(-d/tau) over classes (reference pseudo_labels :147)."""
    return jnp.exp(-dis / tau) / jnp.exp(-dis / tau).sum(axis=-1, keepdims=True)


def fuse_prior(prop: jnp.ndarray, prior: jnp.ndarray) -> jnp.ndarray:
    """prop * prior, renormalized (reference pseudo_labels :159-160)."""
    fused = prop * prior
    return fused / fused.sum(axis=-1, keepdims=True)


def hard_labels(fused: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """argmax with 255 where max prob < thresh (reference pseudo_labels :163-166)."""
    mx = fused.max(axis=-1)
    lbl = fused.argmax(axis=-1).astype(jnp.int32)
    return jnp.where(mx < thresh, 255, lbl)


# ---------------------------------------------------------------------------
# Persistence (pickle-compatible with the reference)
# ---------------------------------------------------------------------------


def _to_numpy(x):
    try:  # torch tensors in reference pickles
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def save(state: ProtoState, loc: str) -> None:
    """3-tuple pickle (prototypes, squared_mean, counter) (reference save :37-38)."""
    payload = (
        np.asarray(state.mean),
        np.asarray(state.sq_mean),
        np.asarray(state.count),
    )
    with open(loc, "wb") as f:
        pickle.dump(payload, f)


def load(state: ProtoState, loc: str) -> tuple[ProtoState, bool]:
    """Load a reference-format pickle if it exists (reference load :40-47).

    Accepts both the live 3-tuple format and the legacy 2-tuple
    (prototypes, counter) found in the reference repo root.
    """
    if not os.path.exists(loc):
        return state, False
    with open(loc, "rb") as f:
        payload = pickle.load(f)
    if len(payload) == 3:
        mean, sq, count = (_to_numpy(p) for p in payload)
    elif len(payload) == 2:  # legacy: no squared mean recorded
        mean, count = (_to_numpy(p) for p in payload)
        sq = np.asarray(mean) ** 2
    else:
        raise ValueError(f"unexpected prototype pickle arity {len(payload)}")
    return (
        state.replace(
            mean=jnp.asarray(mean, jnp.float32),
            sq_mean=jnp.asarray(sq, jnp.float32),
            count=jnp.asarray(count, jnp.float32),
        ),
        True,
    )
