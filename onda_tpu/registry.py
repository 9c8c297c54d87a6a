"""Registries: model / dataset / adaptation-method resolution.

Mirrors the reference handler layer (reference framework/handlers/): name
whitelists with runtime asserts act as schema checks (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import unset

MODEL_NAMES = [
    "DeepLabv2-Resnet50",
    "DeepLabv2-Resnet101",
    "DeepLabv2-Resnet101-ProDA",
    "DeepLabv2-Resnet50-GN",
]

DATABASE_NAMES = [
    "rainy_cityscapes_video",
    "external_video",
    "rainy_cityscapes",
    "fog_cityscapes",
]

ADAPTATION_METHOD_NAMES = [
    "PROTO_ONLINE",
    "ADVENT",
    "PROTO_ONLINE_VSWITCH",
    "PROTO_ONLINE_HSWITCH",
    "PROTO_ADVENT",
    "PROTO_ONLINE_HYBRIDSWITCH",
]


def get_model(cfg, n_classes: int):
    """Build the Flax model + init variables + optional checkpoint load.

    Reference: framework/handlers/model_handler.py:14-60 (incl. the
    imagenet-checkpoint prefix surgery and multi_level override).
    Returns (model, variables).
    """
    from .models import build_deeplab_v2

    import jax.numpy as jnp

    name = cfg.MODEL.NAME
    assert name in MODEL_NAMES, f"cfg.MODEL.NAME should be in {MODEL_NAMES}"
    classifier = cfg.MODEL.CLASSIFIER if not unset(cfg.MODEL.CLASSIFIER) else "normal"
    multi_level = bool(cfg.MODEL.MULTI_LEVEL)
    # compute precision: f32 (checkpoint-parity, default) or bf16 (TPU speed)
    dtype = jnp.bfloat16 if cfg.OTHERS.PRECISION in ("bf16", "bfloat16") else None
    # OTHERS.REMAT: per-bottleneck activation rematerialization (memory for
    # recompute; lets f32 full-res batch 8 train within 16G HBM)
    remat = isinstance(cfg.OTHERS.REMAT, bool) and cfg.OTHERS.REMAT
    r50, r101 = (3, 4, 6, 3), (3, 4, 23, 3)
    preloaded_sd = None  # set when a branch must inspect the checkpoint early
    if name == "DeepLabv2-Resnet50":
        model = build_deeplab_v2(n_classes, r50, classifier, multi_level, dtype=dtype,
                                 remat=remat)
    elif name == "DeepLabv2-Resnet101":
        model = build_deeplab_v2(n_classes, r101, classifier, multi_level, dtype=dtype,
                                 remat=remat)
    elif name == "DeepLabv2-Resnet101-ProDA":
        # Microsoft ProDA's R101 DeepLab (reference model_handler.py:28-30,
        # deeplabv2_proda.py:310-419,499-529): head at `layer5`, multi_level
        # forced off. bn_clr (the optional `bn_pretrain` BatchNorm before the
        # head) is auto-detected from the checkpoint keys — the reference's
        # handler hardcodes bn_clr=False and so can't load bn_clr checkpoints.
        cfg.MODEL.MULTI_LEVEL = False
        bn_clr = False
        load_probe = cfg.MODEL.LOAD
        if load_probe is not None and not unset(load_probe) and load_probe != "None" \
                and "imagenet" not in str(load_probe).lower():
            from .models.import_torch import load_torch_checkpoint

            # unpickled once here; reused below (ProDA containers are large)
            preloaded_sd = load_torch_checkpoint(load_probe)
            bn_clr = any(k.startswith("bn_pretrain.") for k in preloaded_sd)
        model = build_deeplab_v2(n_classes, r101, "ProDA", multi_level=False,
                                 proda_layout=True, bn_clr=bn_clr, dtype=dtype,
                                 remat=remat)
    else:  # DeepLabv2-Resnet50-GN
        model = build_deeplab_v2(
            n_classes, r50, classifier, multi_level, group_norm_backbone=True, dtype=dtype,
            remat=remat,
        )

    w, h = cfg.SCHEME.RESOLUTION
    variables = model.init(jax.random.key(0), jnp.zeros((1, int(h), int(w), 3)), train=False)
    variables = dict(variables)

    load = cfg.MODEL.LOAD
    if load is not None and not unset(load) and load != "None":
        from .models.import_torch import (
            imagenet_prefix_surgery,
            load_torch_checkpoint,
            torch_state_dict_to_flax,
        )

        sd = preloaded_sd if preloaded_sd is not None else load_torch_checkpoint(load)
        if "imagenet" in str(load).lower():
            sd = imagenet_prefix_surgery(sd)
            variables = torch_state_dict_to_flax(sd, variables, strict=False)
        else:
            variables = torch_state_dict_to_flax(sd, variables)
    return model, variables


def get_db(cfg) -> dict:
    """Split metadata tables per domain (reference database_handler.py:12-73).

    Returns {"domains_src": [...], "domains_trg": [...], "db_info": info} with
    each domain entry a {"train": {set_: df}, "val": {set_: df}} bucket.
    """
    import os

    from .data import metadata as MD
    from .data.splits import get_split

    name = cfg.SCHEME.DATASET
    assert name in DATABASE_NAMES, f"cfg.SCHEME.DATASET not in {DATABASE_NAMES}"
    info = MD.load_dataset_info()

    table_env = {
        "rainy_cityscapes": "metadata.json",
        "fog_cityscapes": "metadata_fog.json",
        "rainy_cityscapes_video": "metadata_video.json",
        "external_video": "metadata_bern.json",
    }[name]
    table_path = cfg.SCHEME.METADATA if not unset(cfg.SCHEME.METADATA) else None
    if table_path is None:
        table_path = os.path.join(str(cfg.SCHEME.PATH), table_env)
    if not os.path.exists(table_path):
        raise FileNotFoundError(
            f"metadata table {table_path} not found — generate it with "
            f"`python tools/make_metadata.py --root {cfg.SCHEME.PATH}` "
            "(the reference's metadata JSONs are not distributed)"
        )
    table = MD.load_table(table_path)

    # both video datasets are train-only streams in the reference — their split
    # builders emit no "val" buckets at all (reference database_handler.py:21-42,
    # weather_cityscapes_video_sets.py:26-30, bern_video/video_sets.py)
    labeled_val = name not in ("external_video", "rainy_cityscapes_video")
    domains = list(cfg.SCHEME.SOURCE) + list(cfg.SCHEME.DOMAIN_ORDER)
    dbs = []
    for domain in domains:
        valset = [domain] if labeled_val else []
        dbs.append(
            get_split(table, cfg.SCHEME.COLUMN, [domain], valset, cfg.SCHEME.FILTERS or {})
        )
    n_src = len(list(cfg.SCHEME.SOURCE))
    return {"domains_src": dbs[:n_src], "domains_trg": dbs[n_src:], "db_info": info}


def get_adapt_method(cfg):
    """Adaptation-method class by name (reference adaptation_method_handler.py:11-40)."""
    name = cfg.METHOD.ADAPTATION.NAME
    assert name in ADAPTATION_METHOD_NAMES, (
        f"cfg.METHOD.ADAPTATION.NAME not in {ADAPTATION_METHOD_NAMES}"
    )
    if name == "ADVENT":
        from .methods.advent import AdventAdapter

        return AdventAdapter
    if name == "PROTO_ADVENT":
        from .methods.proto_advent import ProtoAdventAdapter

        return ProtoAdventAdapter
    from .methods.proto_online import ProtoOnlineAdapter

    return ProtoOnlineAdapter
