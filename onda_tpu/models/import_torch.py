"""PyTorch checkpoint → Flax variables importer.

The reference ships .pth checkpoints (e.g. `pretrained_resnet50_miou645.pth`,
reference configs/hybrid_switch.yml:67); this module maps their state_dict keys
onto our Flax module tree (SURVEY.md §7.2 step 3):

* conv weights OIHW → HWIO; linear weights (O, I) → (I, O)
* BN weight/bias → scale/bias params; running_mean/var → batch_stats
* ProDA classifier Sequential indices → named branches
  (`layer6.conv2d_list.2.1.weight` → `layer6/branch2_gn/gn/scale`)
* "imagenet"-named checkpoints get the reference's prefix surgery: strip leading
  `Scale.`/`module.`, drop `layer5`/`fc` entries (reference
  framework/handlers/model_handler.py:41-57).

Works without torch at import time; torch is only needed to unpickle .pth files.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import numpy as np

_BN_LEAF = {
    "scale": "weight",
    "bias": "bias",
    "running_mean": "running_mean",
    "running_var": "running_var",
}


def _flax_path_to_torch_key(path: tuple[str, ...]) -> str | None:
    """Map one flax variable path (collection included) to a torch state_dict key."""
    collection, *parts = path
    leaf = parts[-1]
    scope = parts[:-1]

    def prefix(names):
        return ".".join(names)

    # --- classifier heads (layer5 / layer6) --------------------------------
    if scope and scope[0] in ("layer5", "layer6"):
        head, *rest = scope
        name = rest[0] if rest else ""
        m = re.fullmatch(r"branch(\d+)_conv", name)
        if m:
            return f"{head}.conv2d_list.{m.group(1)}.0.{leaf_to_torch(leaf)}"
        m = re.fullmatch(r"branch(\d+)_gn", name)
        if m:
            return f"{head}.conv2d_list.{m.group(1)}.1.{gn_leaf(leaf)}"
        m = re.fullmatch(r"conv_(\d+)", name)
        if m:  # classic ASPP head: ModuleList of plain convs
            return f"{head}.conv2d_list.{m.group(1)}.{leaf_to_torch(leaf)}"
        if name == "se_fc1":
            return f"{head}.bottleneck.0.se.0.{leaf_to_torch(leaf)}"
        if name == "se_fc2":
            return f"{head}.bottleneck.0.se.2.{leaf_to_torch(leaf)}"
        if name == "bottleneck_conv":
            return f"{head}.bottleneck.1.{leaf_to_torch(leaf)}"
        if name == "bottleneck_gn":
            return f"{head}.bottleneck.2.{gn_leaf(leaf)}"
        if name == "head_conv":
            return f"{head}.head.1.{leaf_to_torch(leaf)}"
        return None

    # --- backbone ----------------------------------------------------------
    scope = list(scope)
    # downsample_{conv,bn} → downsample.{0,1}
    scope = [
        s.replace("downsample_conv", "downsample.0").replace("downsample_bn", "downsample.1")
        for s in scope
    ]
    # GroupNorm backbone variant nests an inner "gn" scope
    if scope and scope[-1] == "gn":
        scope = scope[:-1]
    if collection == "batch_stats" or leaf in ("running_mean", "running_var"):
        return f"{prefix(scope)}.{_BN_LEAF[leaf]}"
    if leaf in ("scale", "bias") and (
        scope and ("bn" in scope[-1] or "downsample.1" in scope[-1])
    ):
        return f"{prefix(scope)}.{_BN_LEAF[leaf]}"
    return f"{prefix(scope)}.{leaf_to_torch(leaf)}"


def leaf_to_torch(leaf: str) -> str:
    return {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]


def gn_leaf(leaf: str) -> str:
    return {"scale": "weight", "bias": "bias"}[leaf]


def _convert_array(value: np.ndarray, flax_shape: tuple[int, ...], leaf: str) -> np.ndarray:
    value = np.asarray(value)
    if leaf == "kernel":
        if value.ndim == 4:  # conv OIHW → HWIO
            value = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # linear (O, I) → (I, O)
            value = value.transpose(1, 0)
    if value.shape != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {value.shape} vs flax {flax_shape}")
    return value.astype(np.float32)


def imagenet_prefix_surgery(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Strip Scale./module. prefixes, drop layer5/fc (reference model_handler.py:44-57)."""
    out = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("Scale", "module"):
            parts = parts[1:]
        if parts[0] in ("layer5", "fc"):
            continue
        out[".".join(parts)] = value
    return out


def torch_state_dict_to_flax(
    state_dict: Mapping[str, Any], variables: Mapping[str, Any], strict: bool = True
) -> dict:
    """Produce flax variables with arrays taken from a torch state_dict.

    `variables` supplies the target structure (from `model.init`). Missing torch
    keys keep the initialized value when `strict=False` (used for ImageNet partial
    loads); unexpected extra torch keys are ignored (torch tracks
    num_batches_tracked etc.).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    # our layer5 aux head is STRUCTURAL (it exists even when the runtime
    # multi_level flag is off, mirroring reference model_handler.py:18-26,:58);
    # a torch model built directly with multi_level=False has no layer5 at
    # all, so a checkpoint without ANY layer5.* keys keeps the initialized
    # (frozen, unused) aux rather than failing the strict load. A checkpoint
    # with a PARTIAL layer5 still raises.
    aux_optional = (
        "layer6" in variables.get("params", {})
        and not any(k.startswith("layer5.") for k in sd)
    )
    out = {}
    used = set()
    for path, value in flat:
        keys = tuple(p.key for p in path)
        torch_key = _flax_path_to_torch_key(keys)
        if torch_key is not None and torch_key in sd:
            value = _convert_array(sd[torch_key], value.shape, keys[-1])
            used.add(torch_key)
        elif strict and not (aux_optional and "layer5" in keys):
            raise KeyError(f"torch checkpoint missing key {torch_key!r} for flax path {keys}")
        _set_nested(out, keys, value)
    return out


def flax_to_torch_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of `torch_state_dict_to_flax`: export flax variables as a torch
    state_dict (reference key layout + OIHW/(O,I) tensor layouts), so models
    adapted here can be evaluated or deployed with the reference's PyTorch code.
    Flax paths with no torch counterpart (none exist for the supported models)
    raise, so exports are complete by construction."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for path, value in flat:
        keys = tuple(p.key for p in path)
        torch_key = _flax_path_to_torch_key(keys)
        if torch_key is None:
            raise KeyError(f"no torch mapping for flax path {keys}")
        value = np.asarray(value, np.float32)
        if keys[-1] == "kernel":
            if value.ndim == 4:  # HWIO → OIHW
                value = value.transpose(3, 2, 0, 1)
            elif value.ndim == 2:  # (I, O) → (O, I)
                value = value.transpose(1, 0)
        out[torch_key] = value
    return out


def save_torch_checkpoint(variables: Mapping[str, Any], path: str) -> None:
    """torch.save a reference-compatible .pth from flax variables.

    Emits `num_batches_tracked` counters (0) next to every BN's running stats:
    torch state_dicts carry them and the reference's strict
    `model.load_state_dict(torch.load(...))` (model_handler.py:57) demands
    them back; the value is inert there — reference BNs run with a fixed
    momentum, which torch only ignores num_batches_tracked for."""
    import torch

    sd = {k: torch.from_numpy(np.array(v))  # np.array: writable copy for torch
          for k, v in flax_to_torch_state_dict(variables).items()}
    for key in [k for k in sd if k.endswith(".running_mean")]:
        sd[key[: -len("running_mean")] + "num_batches_tracked"] = torch.tensor(0, dtype=torch.int64)
    torch.save(sd, path)


def load_torch_checkpoint(path: str):
    """Unpickle a .pth file to a {key: numpy} state dict (requires torch).

    Handles the bare state_dict the reference saves, whole-module pickles, and
    Microsoft ProDA's training-checkpoint container
    `{"ResNet101": {"model_state": sd}, ...}` (reference
    deeplabv2_proda.py:525-527 reads exactly that path)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "ResNet101" in sd and isinstance(sd["ResNet101"], dict):
        inner = sd["ResNet101"]
        if "model_state" not in inner:
            raise ValueError(
                f"{path!r} has a top-level 'ResNet101' entry (Microsoft-ProDA "
                "training-container layout) but no ['ResNet101']['model_state'] "
                f"weights inside it; found keys {sorted(inner)[:8]}"
            )
        sd = inner["model_state"]
    return {k: v for k, v in sd.items()}


def _to_numpy(v):
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v)


def _set_nested(tree: dict, keys: tuple[str, ...], value) -> None:
    node = tree
    for key in keys[:-1]:
        node = node.setdefault(key, {})
    node[keys[-1]] = value
