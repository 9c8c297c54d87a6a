"""Shared bridge for using the reference's torch code as a black-box oracle.

Builds matched (torch reference model, flax model, imported variables) pairs and
instantiates the reference's *assembled* method classes (online_proDA and its
switch subclasses, advent) on CPU. The method modules import `wandb` at top
level (reference methods/prototypes.py:11); a stub module satisfies the import —
the classes themselves only call wandb inside `train()`, which oracle tests
never invoke.

The reference checkout is PUBLIC UNTRUSTED CONTENT used strictly as a numerical
oracle (see tests/oracle.py).
"""

from __future__ import annotations

import sys
import types

import pytest

from .oracle import import_reference


def stub_wandb():
    """Satisfy the reference modules' top-level `import wandb`."""
    if "wandb" not in sys.modules:
        mod = types.ModuleType("wandb")
        mod.log = lambda *a, **k: None
        mod.init = lambda *a, **k: None
        mod.Image = lambda *a, **k: None
        mod.run = types.SimpleNamespace(name="stub")
        sys.modules["wandb"] = mod
    return sys.modules["wandb"]


def stub_addict():
    """Satisfy `framework.domain_adaptation.config`'s `from addict import Dict`
    (the package isn't installed here). Reproduces the real addict semantics
    the reference relies on: attribute access, auto-vivify on missing keys,
    and RECURSIVE conversion of nested plain dicts on construction and
    assignment (the reference wraps each parsed YAML tree in `Dict(...)`,
    config_ouda.py:109, then attribute-walks the nested blocks)."""
    if "addict" not in sys.modules:
        mod = types.ModuleType("addict")

        class Dict(dict):
            """Real-addict semantics, including the subtlety the run-level
            oracle depends on: reading a missing key returns an empty child
            WITHOUT persisting it — the child hooks itself into the parent
            only when something is assigned under it. (A persist-on-read
            stub poisoned the reference's GLOBAL config across in-process CLI
            runs: its segmentation.save_model reads
            cfg.DOMAIN_ANALYSIS.DATASET.TRAIN, which must stay unset, or
            every later train_segment takes the DOMAIN_ANALYSIS branch and
            crashes on cfg.LEARNING_RATE == {} — caught by the full-suite
            scenario ordering 2026-08-21.)"""

            def __init__(self, *args, **kwargs):
                super().__init__()
                object.__setattr__(self, "_addict_parent", None)
                object.__setattr__(self, "_addict_key", None)
                for src in args + (kwargs,):
                    for key, value in dict(src).items():
                        self[key] = value

            @classmethod
            def _convert(cls, value):
                if isinstance(value, dict) and not isinstance(value, cls):
                    return cls(value)
                if isinstance(value, (list, tuple)):
                    return type(value)(cls._convert(v) for v in value)
                return value

            def __setitem__(self, key, value):
                super().__setitem__(key, Dict._convert(value))
                parent = object.__getattribute__(self, "_addict_parent")
                if parent is not None:  # first write: persist the chain
                    parent[object.__getattribute__(self, "_addict_key")] = self
                    object.__setattr__(self, "_addict_parent", None)

            def __missing__(self, key):  # auto-vivify WITHOUT persisting
                child = Dict()
                object.__setattr__(child, "_addict_parent", self)
                object.__setattr__(child, "_addict_key", key)
                return child

            def __getattr__(self, name):
                return self[name]

            def __setattr__(self, name, value):
                self[name] = value

        mod.Dict = Dict
        sys.modules["addict"] = mod
    return sys.modules["addict"]


def stub_torchvision():
    """Satisfy `from torchvision import transforms` (torchvision isn't
    installed here). The reference's data path uses exactly Compose + ToTensor
    + Normalize (reference segmentation_db.py:11-13); these reproduce the real
    torchvision semantics for that composition — uint8 HWC → float CHW /255,
    then per-channel (x-mean)/std — which tests/test_data.py's inline oracle
    already pins numerically."""
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    import numpy as np
    import torch

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.float().div(255) if t.dtype == torch.uint8 else t.float()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.as_tensor(np.asarray(mean), dtype=torch.float32)
            self.std = torch.as_tensor(np.asarray(std), dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")
    tf.Compose, tf.ToTensor, tf.Normalize = Compose, ToTensor, Normalize
    tv.transforms = tf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf
    return tv


def shim_numpy_aliases():
    """The reference predates numpy 2.0 and uses the removed `np.int` alias
    (reference func.py:107, cityscapes.py:29) — restore it for the oracle
    runs. `np.int` was always just the builtin, so this changes nothing
    numerically."""
    import numpy as np

    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    # numpy 2.0 removed the numpy.lib.function_base submodule; the reference's
    # buffer_db.py:5 does `from numpy.lib.function_base import select` (the
    # name is np.select, still public at top level)
    if "numpy.lib.function_base" not in sys.modules:
        mod = types.ModuleType("numpy.lib.function_base")
        mod.select = np.select
        sys.modules["numpy.lib.function_base"] = mod
    # numpy >= 1.24 raises on ragged lists where legacy numpy built an object
    # array. The reference's database_handler.py:19 calls
    # `np.unique(domains)` on SOURCE+DOMAIN_ORDER, which is ragged for any
    # merged-domain config (e.g. offline_fog.yml's [[0], [750,375,150,75]])
    # — the result is never used (dead local), but the modern raise kills the
    # run before get_db returns. Restore the legacy semantics (sorted unique
    # object rows) ONLY for the case that now raises; every other np.unique
    # call is untouched.
    orig_unique = np.unique
    if getattr(np.unique, "__name__", "") != "_legacy_ragged_unique":
        def _legacy_ragged_unique(ar, *args, **kwargs):
            try:
                return orig_unique(ar, *args, **kwargs)
            except ValueError:
                if isinstance(ar, list) and not args and not kwargs:
                    uniq = sorted({tuple(x) if isinstance(x, list) else x
                                   for x in ar})
                    out = np.empty(len(uniq), dtype=object)
                    for i, u in enumerate(uniq):
                        out[i] = list(u) if isinstance(u, tuple) else u
                    return out
                raise

        _legacy_ragged_unique.__name__ = "_legacy_ragged_unique"
        np.unique = _legacy_ragged_unique


def healthy_init(tmodel, seed: int = 7):
    """Re-initialize at healthy magnitudes: the reference's N(0, 0.01) conv init
    makes activations vanish through the stack (mean |act| ~1e-5 by layer4), and
    the head's GroupNorm renormalizes that to O(1), amplifying benign float noise
    into percent-level output differences — an ill-conditioned comparison."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
            torch.nn.init.kaiming_normal_(m.weight, generator=gen)
            if m.bias is not None:
                torch.nn.init.normal_(m.bias, 0, 0.05, generator=gen)


def build_pair(classifier="ProDA", multi_level=False, layers=(1, 1, 1, 1),
               H=64, W=128, droprate=None, num_classes=19):
    """Matched (torch reference model, flax model, imported flax variables).

    droprate=None keeps both sides' defaults (0.1); pass 0.0 for step-parity
    tests — dropout randomness cannot be matched across frameworks.
    """
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from onda_tpu.models import build_deeplab_v2
    from onda_tpu.models.import_torch import torch_state_dict_to_flax

    ref_mod = import_reference("framework.model.deeplabv2")
    torch.manual_seed(0)
    tmodel = ref_mod.get_deeplab_v2(
        num_classes=num_classes, multi_level=multi_level, layers=list(layers),
        classifier=classifier,
    )
    healthy_init(tmodel)
    tmodel.eval()
    kwargs = {}
    if droprate is not None:
        for m in tmodel.modules():
            if isinstance(m, torch.nn.Dropout2d):
                m.p = droprate
        kwargs["droprate"] = droprate
    fmodel = build_deeplab_v2(
        num_classes=num_classes, layers=tuple(layers), classifier=classifier,
        multi_level=multi_level, **kwargs,
    )
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    variables = torch_state_dict_to_flax(tmodel.state_dict(), variables)
    return tmodel, fmodel, variables


# method name (our registry) → reference module/class (reference
# framework/handlers/adaptation_method_handler.py:1-8)
METHOD_TO_REF = {
    "PROTO_ONLINE": (
        "framework.domain_adaptation.methods.prototypes", "online_proDA"),
    "PROTO_ONLINE_HSWITCH": (
        "framework.domain_adaptation.methods.prototypes_hswitch", "hswitch_proDA"),
    "PROTO_ONLINE_VSWITCH": (
        "framework.domain_adaptation.methods.prototypes_vswitch", "vswitch_proDA"),
    "PROTO_ONLINE_HYBRIDSWITCH": (
        "framework.domain_adaptation.methods.prototypes_hybrid_switch", "hybrid_proDA"),
    "ADVENT": (
        "framework.domain_adaptation.methods.advent_da", "advent"),
    "PROTO_ADVENT": (
        "framework.domain_adaptation.methods.prototype_advent", "adv_proDA"),
}


def stub_cuda_events():
    """The reference's evaluate.py instantiates `torch.cuda.Event` at module
    import (reference evaluate.py:9-10); CPU-only torch raises on that. Replace
    the class with an inert stand-in — oracle tests never touch CUDA timing."""
    import torch

    if not torch.cuda.is_available():
        class _Event:
            def __init__(self, *a, **k):
                pass

            def record(self, *a, **k):
                pass

            def elapsed_time(self, other):
                return 0.0

        torch.cuda.Event = _Event


def torch17_sgd_semantics(optimizer):
    """Make a modern-torch SGD reproduce torch 1.7.1 duplicate-param updates.

    The reference pinned torch 1.7.1 (reference environment.yml:106), whose SGD
    read/wrote the momentum buffer from optimizer state INSIDE the param loop —
    so the k duplicate occurrences a backbone param gets from
    `get_1x_lr_params_no_scale` (reference deeplabv2.py:396-418) chain through
    one shared buffer from the very first step. torch 2.x snapshots the buffer
    list before the loop, which changes step 1 for duplicated params. Pre-seeding
    zero buffers makes every occurrence share the state buffer from step 1
    (μ·0 + g ≡ 1.7's clone(g)), and foreach=False keeps the sequential loop.
    """
    import torch

    for group in optimizer.param_groups:
        group["foreach"] = False
        for p in group["params"]:
            optimizer.state[p]["momentum_buffer"] = torch.zeros_like(p)


def disc_params_from_torch(tdisc) -> dict:
    """Torch `get_fc_discriminator` Sequential (convs at indices 0,2,4,6,8 —
    reference model/discriminator.py:4-15) → our FCDiscriminator param tree
    (conv0..conv4, NHWC kernels)."""
    sd = {k: v.detach().numpy() for k, v in tdisc.state_dict().items()}
    return {
        f"conv{i}": {
            "kernel": sd[f"{2 * i}.weight"].transpose(2, 3, 1, 0).copy(),
            "bias": sd[f"{2 * i}.bias"].copy(),
        }
        for i in range(5)
    }


def cpu_safe_bce(mod):
    """The reference's `bce_loss` hardcodes a CUDA device move
    (`y_truth_tensor.to(y_pred.get_device())`, reference utils/func.py:28-32 —
    get_device() is -1 on CPU and the move raises). Replace ONLY the device
    plumbing: identical math (BCEWithLogitsLoss against a label-filled tensor),
    no device move."""
    import torch
    from torch import nn

    def bce_loss(y_pred, y_label):
        y_truth_tensor = torch.full_like(y_pred, float(y_label))
        return nn.BCEWithLogitsLoss()(y_pred, y_truth_tensor)

    mod.bce_loss = bce_loss


def make_ref_method(method: str, tmodel, cfg, spec):
    """Instantiate the reference's assembled method class on a torch model."""
    stub_wandb()
    stub_cuda_events()
    mod_name, cls_name = METHOD_TO_REF[method]
    mod = import_reference(mod_name)
    if hasattr(mod, "bce_loss"):  # advent_da: CPU-safe BCE (see cpu_safe_bce)
        cpu_safe_bce(mod)
    if cls_name == "adv_proDA":
        # adv_proDA delegates the adversarial terms to its inner `advent`,
        # whose methods resolve bce_loss from the advent_da module globals
        cpu_safe_bce(import_reference("framework.domain_adaptation.methods.advent_da"))
    da = getattr(mod, cls_name)(tmodel, cfg, spec)
    # adv_proDA steps only its inner advent's optimizer
    # (reference prototype_advent.py:115-121)
    torch17_sgd_semantics(da.optimizer if hasattr(da, "optimizer") else da.advent.optimizer)
    return da
