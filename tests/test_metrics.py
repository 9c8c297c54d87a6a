"""Golden tests: on-device metrics vs the reference numpy/torch versions."""

import numpy as np
import pytest
import jax.numpy as jnp

import jax

from onda_tpu.ops import metrics as _m


class metrics:
    fast_hist = staticmethod(jax.jit(_m.fast_hist, static_argnums=2))
    per_class_iu = staticmethod(_m.per_class_iu)
    ece_init = staticmethod(_m.ece_init)
    ece_record = staticmethod(jax.jit(_m.ece_record))
    ece_value = staticmethod(jax.jit(_m.ece_value))
    mean_entropy = staticmethod(jax.jit(_m.mean_entropy))
    miou = staticmethod(_m.miou)

from .oracle import import_reference

torch = pytest.importorskip("torch")


def test_fast_hist_and_iou(rng):
    ref = import_reference("framework.utils.func")
    n = 19
    label = rng.integers(0, n + 3, size=(4, 33)).astype(np.int64)
    label[label >= n] = 255
    pred = rng.integers(0, n, size=(4, 33)).astype(np.int64)
    want = ref.fast_hist(label.flatten(), pred.flatten(), n)
    got = np.asarray(metrics.fast_hist(jnp.asarray(label), jnp.asarray(pred), n))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(metrics.per_class_iu(got), ref.per_class_iu(want))


def test_ece_stream(rng):
    ref_mod = import_reference("framework.utils.monitoring")
    bins = 10
    ece_ref = ref_mod.ECE(bins)
    acc = metrics.ece_init(bins)
    for _ in range(3):
        probs = rng.random(size=(2, 5, 6, 7)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        probs *= 0.999  # keep max conf < 1 (the reference bins assume conf < 1)
        label = rng.integers(0, 7, size=(2, 5, 6)).astype(np.int64)
        ece_ref.record(
            torch.from_numpy(np.moveaxis(probs, -1, 1).copy()),
            torch.from_numpy(label),
            axis=1,
        )
        acc = metrics.ece_record(acc, jnp.asarray(probs), jnp.asarray(label))
    assert np.isclose(float(metrics.ece_value(acc)), ece_ref().item(), rtol=1e-4)


def test_mean_entropy_uniform():
    """Uniform predictions read 1/C, not 1: the reference means its
    prob_2_entropy map over the channel axis too (ops/metrics.py docstring) —
    golden-pinned against the reference's own composition."""
    probs = jnp.full((1, 2, 2, 4), 0.25)
    assert np.isclose(float(metrics.mean_entropy(probs)), 0.25, atol=1e-5)

    torch = pytest.importorskip("torch")
    func = import_reference("framework.utils.func")
    ref = func.prob_2_entropy(torch.from_numpy(
        np.asarray(jnp.moveaxis(probs, -1, 1)))).mean().item()
    assert np.isclose(float(metrics.mean_entropy(probs)), ref, atol=1e-6)


def test_miou_perfect():
    n = 5
    lbl = jnp.asarray(np.arange(n).repeat(10))
    hist = metrics.fast_hist(lbl, lbl, n)
    assert metrics.miou(hist) == pytest.approx(1.0)


def test_ece_record_weight_excludes_padding():
    """Padded evaluation rows (weight 0) must not contribute; real 255-ignore
    pixels still count as incorrect, exactly like the reference ECE
    (reference monitoring.py:106-127, which never sees padded batches)."""
    import jax.numpy as jnp

    probs = jnp.asarray(np.random.default_rng(3).random((2, 4, 5, 6)), jnp.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    labels = jnp.asarray(np.random.default_rng(4).integers(0, 6, (2, 4, 5)), jnp.int32)
    acc_first = _m.ece_record(_m.ece_init(10), probs[:1], labels[:1])
    weight = jnp.asarray([1.0, 0.0])[:, None, None]
    acc_weighted = _m.ece_record(_m.ece_init(10), probs, labels, weight)
    np.testing.assert_allclose(np.asarray(acc_weighted), np.asarray(acc_first), atol=1e-6)
