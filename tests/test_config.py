import copy

import pytest
import yaml

from onda_tpu.config import Config, cfg_from_file, default_config, unset, value_or


def test_missing_key_is_unset_and_falsy():
    cfg = Config()
    assert cfg.NOT_THERE == {}
    assert not cfg.NOT_THERE
    assert unset(cfg.A.B.C)
    # reads do not vivify
    assert "NOT_THERE" not in cfg
    assert "A" not in cfg


def test_write_creates_path():
    cfg = Config()
    cfg.A = Config()
    cfg.A.B = 3
    assert cfg.A.B == 3
    cfg["X"] = {"y": {"z": 1}}
    assert cfg.X.y.z == 1
    assert isinstance(cfg.X.y, Config)


def test_value_or():
    cfg = Config()
    assert value_or(cfg.MISSING, 7) == 7
    assert value_or(None, 7) == 7
    assert value_or(0, 7) == 0
    assert value_or(False, 7) is False


def test_merge_semantics(tmp_path):
    cfg = default_config()
    # defaults from reference config_ouda.py
    assert cfg.SCHEME.DATASET == "rainy_cityscapes"
    assert cfg.METHOD.ADAPTATION.ADVENT.LAMBDA_ADV_MAIN == 0.001
    overlay = {
        "SCHEME": {"RESOLUTION": [128, 64], "NEW_KEY": 5},
        "METHOD": {"ADAPTATION": {"NAME": "PROTO_ONLINE", "PROTO_ONLINE": {"TAU": 2}}},
    }
    f = tmp_path / "c.yml"
    f.write_text(yaml.safe_dump(overlay))
    cfg = cfg_from_file(str(f), cfg)
    assert cfg.SCHEME.RESOLUTION == [128, 64]
    assert cfg.SCHEME.NEW_KEY == 5  # unknown keys accepted silently
    assert cfg.SCHEME.DATASET == "rainy_cityscapes"  # untouched defaults survive
    assert cfg.METHOD.ADAPTATION.NAME == "PROTO_ONLINE"
    assert cfg.METHOD.ADAPTATION.PROTO_ONLINE.TAU == 2
    # ADVENT defaults still present alongside
    assert cfg.METHOD.ADAPTATION.ADVENT.MOMENTUM == 0.9


def test_deepcopy_independent():
    cfg = default_config()
    cp = copy.deepcopy(cfg)
    cp.SCHEME.DATASET = "fog_cityscapes"
    assert cfg.SCHEME.DATASET == "rainy_cityscapes"


def test_empty_dict_value_stays_unset_like():
    cfg = Config({"SCHEME": {"FILTERS": {}}})
    assert unset(cfg.SCHEME.FILTERS)
    assert cfg.SCHEME.FILTERS == {}


@pytest.mark.parametrize(
    "name",
    ["hybrid_switch", "advent", "validation", "validation_offline_fog",
     "validation_offline_advent"],
)
def test_shipped_configs_parse(name):
    cfg = cfg_from_file(f"configs/{name}.yml")
    assert cfg.MODEL.NAME.startswith("DeepLabv2")
    assert cfg.TRAINING.BATCH_SIZE == 4


def test_empty_mapping_preserves_default_subtree():
    """`TRAINING: {}` in user YAML must merge nothing — the reference's
    _merge_a_into_b recurses into every Dict including empty ones
    (reference config_ouda.py:99-104), so defaults survive."""
    from onda_tpu.config import default_config, merge_into

    cfg = default_config()
    merge_into({"TRAINING": {}, "BRAND_NEW_BLOCK": {}}, cfg)
    assert int(cfg.TRAINING.RANDOM_SEED) == 123
    assert cfg.TRAINING.DOMAIN_EPOCH == 1
    assert cfg.BRAND_NEW_BLOCK == {}  # unknown keys still accepted silently
