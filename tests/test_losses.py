"""Golden tests: our jnp losses vs the reference torch implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

import jax

from onda_tpu.ops import losses as _losses


class losses:  # jitted views of the loss library (eager dispatch is slow on CI)
    cross_entropy_2d = staticmethod(jax.jit(_losses.cross_entropy_2d, static_argnames="soft"))
    rce = staticmethod(jax.jit(_losses.rce, static_argnames="soft"))
    js_divergence = staticmethod(jax.jit(_losses.js_divergence))
    entropy_loss = staticmethod(jax.jit(_losses.entropy_loss))
    regular_loss = staticmethod(jax.jit(_losses.regular_loss, static_argnames="regularizer"))
    prob_2_entropy = staticmethod(jax.jit(_losses.prob_2_entropy))
    bce_with_logits = staticmethod(jax.jit(_losses.bce_with_logits, static_argnames="label"))
    ewc_loss = staticmethod(jax.jit(_losses.ewc_loss, static_argnames="lamda"))

from .oracle import import_reference

torch = pytest.importorskip("torch")

N, H, W, C = 2, 5, 7, 19


@pytest.fixture
def data(rng):
    logits = rng.normal(size=(N, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C + 2, size=(N, H, W)).astype(np.int64)
    labels[labels >= C] = 255  # sprinkle ignore pixels
    soft = rng.random(size=(N, H, W, C)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    return logits, labels, soft


def t_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_cross_entropy_hard(data):
    ref = import_reference("framework.utils.loss")
    logits, labels, _ = data
    want = ref.cross_entropy_2d(t_nchw(logits), torch.from_numpy(labels)).item()
    got = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-5, atol=1e-6)


def test_cross_entropy_all_ignored():
    logits = np.zeros((1, 2, 2, C), np.float32)
    labels = np.full((1, 2, 2), 255, np.int64)
    got = float(losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == 0.0  # reference returns zeros(1) (loss.py:38-39)


def test_cross_entropy_soft(data):
    """Oracle is the PRODUCTION soft-CE path, func.loss_calc (reference
    func.py:35-42): it casts the soft target with `.long()` before CXE, so
    probabilities truncate to 0/1 — the quirk every reference CE call carries
    (see ops/losses.py docstring). Bare loss.cross_entropy_2d without the cast
    is never reached with soft targets upstream."""
    ref = import_reference("framework.utils.func")
    logits, _, soft = data
    probs = np.abs(logits) + 0.1  # reference soft path takes log of the input directly
    # make some targets land exactly on 1.0 so the truncation keeps a few ones
    soft = soft.copy()
    soft[0, 0, :2] = 0.0
    soft[0, 0, :2, 0] = 1.0
    want = ref.loss_calc(t_nchw(probs), t_nchw(soft), "cpu", soft=True).item()
    got = float(losses.cross_entropy_2d(jnp.asarray(probs), jnp.asarray(soft), soft=True))
    assert np.isclose(got, want, rtol=1e-5)
    # and the gradient wrt logits is ZERO wherever the truncated target is 0 —
    # the inertness the trajectory parity depends on
    g = jax.grad(lambda lg: losses.cross_entropy_2d(lg, jnp.asarray(soft), soft=True))(
        jnp.asarray(probs))
    g = np.asarray(g)
    assert np.all(g[np.trunc(soft) == 0.0] == 0.0)
    assert np.any(g[0, 0, :2, 0] != 0.0)


def test_rce_hard(data):
    ref = import_reference("framework.utils.loss")
    logits, labels, _ = data
    want = ref.rce(t_nchw(logits), torch.from_numpy(labels), "cpu").item()
    got = float(losses.rce(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-5)


def test_rce_soft(data):
    ref = import_reference("framework.utils.loss")
    logits, _, soft = data
    want = ref.rce(t_nchw(logits), t_nchw(soft), "cpu", soft=True).item()
    got = float(losses.rce(jnp.asarray(logits), jnp.asarray(soft), soft=True))
    assert np.isclose(got, want, rtol=1e-5)


def test_js_divergence(data):
    ref = import_reference("framework.utils.loss")
    logits, labels, _ = data
    want = ref.js_divergance(t_nchw(logits), torch.from_numpy(labels), "cpu").item()
    got = float(losses.js_divergence(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isclose(got, want, rtol=1e-4)


def test_entropy_loss(data):
    ref = import_reference("framework.utils.loss")
    logits, _, soft = data
    want = ref.entropy_loss(t_nchw(soft)).item()
    got = float(losses.entropy_loss(jnp.asarray(soft)))
    assert np.isclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("reg", ["MRENT", "MRKLD"])
def test_regular_loss(data, reg):
    # Inline torch oracle for reference methods/prototypes.py:29-39 (importing the
    # reference module itself drags in wandb; the formula is three lines).
    logits, _, _ = data
    t = t_nchw(logits)
    logp = torch.nn.functional.log_softmax(t, dim=1)
    if reg == "MRENT":
        p = torch.nn.functional.softmax(t, dim=1)
        want = ((p * logp).sum() / (t.shape[0] * t.shape[2] * t.shape[3])).item()
    else:
        want = (-logp.sum() / t.numel()).item()
    got = float(losses.regular_loss(reg, jnp.asarray(logits)))
    assert np.isclose(got, want, rtol=1e-5)


def test_prob_2_entropy(data):
    ref = import_reference("framework.utils.func")
    _, _, soft = data
    want = ref.prob_2_entropy(t_nchw(soft)).numpy()
    got = np.moveaxis(np.asarray(losses.prob_2_entropy(jnp.asarray(soft))), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bce_with_logits(rng):
    x = rng.normal(size=(2, 1, 4, 4)).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(x), torch.full((2, 1, 4, 4), 1.0)
    ).item()
    got = float(losses.bce_with_logits(jnp.asarray(x), 1.0))
    assert np.isclose(got, want, rtol=1e-5)


def test_ewc_loss(rng):
    a = [rng.normal(size=(3, 4)).astype(np.float32), rng.normal(size=(5,)).astype(np.float32)]
    b = [rng.normal(size=(3, 4)).astype(np.float32), rng.normal(size=(5,)).astype(np.float32)]
    ref = import_reference("framework.utils.ewc")
    want = ref.ewc_loss(
        0.7, [torch.from_numpy(x) for x in a], [torch.from_numpy(x) for x in b]
    ).item()
    got = float(losses.ewc_loss(0.7, [jnp.asarray(x) for x in a], [jnp.asarray(x) for x in b]))
    assert np.isclose(got, want, rtol=1e-5)


def test_compute_fisher_golden(rng):
    """Diagonal Fisher vs the reference compute_fisher (ewc.py:15-41) on a tiny
    linear model with identical weights."""
    ref = import_reference("framework.utils.ewc")
    n, d, c = 6, 4, 3
    X = rng.normal(size=(n, d)).astype(np.float32)
    Y = rng.integers(0, c, size=(n,)).astype(np.int64)
    W_ = rng.normal(size=(d, c)).astype(np.float32)
    b_ = rng.normal(size=(c,)).astype(np.float32)

    tmodel = torch.nn.Linear(d, c)
    with torch.no_grad():
        tmodel.weight.copy_(torch.from_numpy(W_.T))
        tmodel.bias.copy_(torch.from_numpy(b_))
    fishers_ref = ref.compute_fisher(tmodel, torch.from_numpy(X), torch.from_numpy(Y))
    # torch Linear params order: weight (c, d), bias (c)

    params = {"w": jnp.asarray(W_), "b": jnp.asarray(b_)}
    fisher = _losses.compute_fisher(
        lambda p, x: x @ p["w"] + p["b"], params, jnp.asarray(X), jnp.asarray(Y)
    )
    np.testing.assert_allclose(
        np.asarray(fisher["w"]).T, fishers_ref[0].numpy(), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(fisher["b"]), fishers_ref[1].numpy(), rtol=1e-5, atol=1e-7
    )


def test_ewc_loss_with_fishers(rng):
    """ewc_loss with a Fisher pytree matches the reference formula
    sum(lamda/2 * fisher * (prev - cur)^2)."""
    ref = import_reference("framework.utils.ewc")
    prev = [rng.normal(size=(3, 2)).astype(np.float32), rng.normal(size=(2,)).astype(np.float32)]
    cur = [rng.normal(size=(3, 2)).astype(np.float32), rng.normal(size=(2,)).astype(np.float32)]
    fish = [rng.random(size=(3, 2)).astype(np.float32), rng.random(size=(2,)).astype(np.float32)]
    want = ref.ewc_loss(
        0.7, [torch.from_numpy(p) for p in prev], [torch.from_numpy(c) for c in cur],
        [torch.from_numpy(f) for f in fish],
    ).item()
    got = float(_losses.ewc_loss(
        0.7, [jnp.asarray(p) for p in prev], [jnp.asarray(c) for c in cur],
        [jnp.asarray(f) for f in fish],
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)
