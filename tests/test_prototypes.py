"""Golden tests: prototype engine vs the reference prototype_handler.

All jnp work runs under single jit+scan composites — eager per-op dispatch is
pathologically slow on the 1-core CI box, and jit-compositions are what the real
step uses anyway.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from onda_tpu.ops import prototypes as P

from .oracle import import_reference

torch = pytest.importorskip("torch")

C, F = 19, 16
PIX = 64
ROUNDS = 3


@jax.jit
def run_appends(feats, outs):
    def step(state, fo):
        f, o = fo
        vect, sq, sums = P.class_moments(f, P.onehot_assign(o))
        return P.append(state, vect, sq, sums), None

    return lax.scan(step, P.init_state(C, F), (feats, outs))[0]


@jax.jit
def run_mas(state, feats, outs):
    def step(state, fo):
        f, o = fo
        vect, sq, sums = P.class_moments(f, P.onehot_assign(o))
        return P.ma(state, vect, sq, sums, ma_lambda=0.9), None

    return lax.scan(step, state, (feats, outs))[0]


@jax.jit
def full_pipeline(state, feat, prior):
    """distances → probs → fuse → hard/soft, for both metrics + global_var."""
    out = {}
    for metric in ("euclidean", "mahalanobis"):
        dis = P.distances(feat, state, metric)
        fused = P.fuse_prior(P.proto_probs(dis, state.tau), prior)
        out[metric] = {"dis": dis, "soft": fused, "hard": P.hard_labels(fused, 0.3)}
    out["global_var"] = P.global_var(state)
    out["prototype_var"] = P.prototype_var(state)
    return out


def make_ref(metric="euclidean"):
    mod = import_reference("framework.domain_adaptation.methods.prototype_handler")
    return mod.prototype_handler(ma_lambda=0.9, tau=1.0, thresh=0.3, distance_metric=metric)


@pytest.fixture(scope="module")
def fed():
    """Reference handler + our state, fed the same ROUNDS of appends."""
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(ROUNDS, PIX, F)).astype(np.float32)
    outs = rng.normal(size=(ROUNDS, PIX, C)).astype(np.float32)
    refs = {m: make_ref(m) for m in ("euclidean", "mahalanobis")}
    for r in range(ROUNDS):
        for ref in refs.values():
            ref.append(torch.from_numpy(feats[r]), torch.from_numpy(outs[r]))
    state = run_appends(jnp.asarray(feats), jnp.asarray(outs))
    return refs, state, rng


def test_append_running_moments(fed):
    refs, state, _ = fed
    ref = refs["euclidean"]
    np.testing.assert_allclose(np.asarray(state.mean), ref.prototypes.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.sq_mean), ref.squared_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.count), ref.counter.numpy(), rtol=1e-6)


def test_ma_update(fed):
    refs, state, rng = fed
    ref = make_ref()
    ref.prototypes = refs["euclidean"].prototypes.clone()
    ref.squared_mean = refs["euclidean"].squared_mean.clone()
    ref.counter = refs["euclidean"].counter.clone()
    feats = rng.normal(size=(ROUNDS, PIX, F)).astype(np.float32)
    outs = rng.normal(size=(ROUNDS, PIX, C)).astype(np.float32)
    for r in range(ROUNDS):
        ref.ma(torch.from_numpy(feats[r]), torch.from_numpy(outs[r]))
    state = run_mas(state, jnp.asarray(feats), jnp.asarray(outs))
    np.testing.assert_allclose(np.asarray(state.mean), ref.prototypes.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.sq_mean), ref.squared_mean.numpy(), rtol=1e-4, atol=1e-5)


def test_full_pipeline_parity(fed):
    refs, state, rng = fed
    feat = rng.normal(size=(PIX, F)).astype(np.float32)
    prior = rng.random(size=(PIX, C)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    got = jax.tree.map(np.asarray, full_pipeline(state, jnp.asarray(feat), jnp.asarray(prior)))

    np.testing.assert_allclose(
        got["global_var"], refs["euclidean"].global_var().numpy(), rtol=1e-4, atol=1e-5
    )
    for metric in ("euclidean", "mahalanobis"):
        ref = refs[metric]
        want_dis = ref.distance_measure(torch.from_numpy(feat)).numpy()
        np.testing.assert_allclose(got[metric]["dis"], want_dis, rtol=1e-3, atol=1e-4)
        want_soft = ref.pseudo_labels(
            torch.from_numpy(feat), torch.from_numpy(prior), soft=True
        ).numpy()
        np.testing.assert_allclose(got[metric]["soft"], want_soft, rtol=1e-3, atol=1e-4)
        want_hard = ref.pseudo_labels(torch.from_numpy(feat), torch.from_numpy(prior)).numpy()
        agree = (got[metric]["hard"] == want_hard.reshape(-1)).mean()
        assert agree > 0.99  # near-tie pixels may flip


def test_ma_skips_absent_classes(fed):
    """Classes absent from a batch keep their prototype untouched (reference :88-99)."""
    _, state, rng = fed
    feats = rng.normal(size=(1, 4, F)).astype(np.float32)
    outs = np.full((1, 4, C), -10.0, np.float32)
    outs[..., 3] = 10.0  # only class 3 present
    new = run_mas(state, jnp.asarray(feats), jnp.asarray(outs))
    keep = np.arange(C) != 3
    np.testing.assert_array_equal(np.asarray(new.mean)[keep], np.asarray(state.mean)[keep])
    assert not np.allclose(np.asarray(new.mean)[3], np.asarray(state.mean)[3])


def test_pickle_roundtrip_and_legacy(tmp_path, fed):
    _, state, _ = fed
    loc = str(tmp_path / "proto.pickle")
    P.save(state, loc)
    loaded, ok = P.load(P.init_state(C, F), loc)
    assert ok
    np.testing.assert_allclose(np.asarray(loaded.mean), np.asarray(state.mean))
    import pickle

    legacy = str(tmp_path / "legacy.pickle")
    with open(legacy, "wb") as f:
        pickle.dump((np.asarray(state.mean), np.asarray(state.count)), f)
    loaded2, ok2 = P.load(P.init_state(C, F), legacy)
    assert ok2 and np.allclose(np.asarray(loaded2.mean), np.asarray(state.mean))
    _, ok3 = P.load(P.init_state(C, F), str(tmp_path / "nope.pickle"))
    assert not ok3
