"""Every shipped YAML must merge cleanly into the default schema."""

import glob
import os

import pytest

from fsvlm_tpu.config import get_cfg_default

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_YAMLS = sorted(
    glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"), recursive=True)
)


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, ROOT))
def test_yaml_merges(path):
    cfg = get_cfg_default()
    cfg.merge_from_file(path)
    cfg.freeze()


def test_zoo_is_nonempty():
    assert len(ALL_YAMLS) >= 30


def test_cli_string_mode_values_stay_strings():
    """yaml 1.1 resolves on/off/yes/no to bools; yacs (and the string-typed
    mode knobs like DATALOADER.DEVICE_RESIDENT) require them kept as
    strings from the CLI opts path."""
    cfg = get_cfg_default()
    cfg.merge_from_list([
        "DATALOADER.DEVICE_RESIDENT", "on",
        "TRAIN.EPOCH_FUSE", "off",
    ])
    assert cfg.DATALOADER.DEVICE_RESIDENT == "on"
    assert cfg.TRAIN.EPOCH_FUSE == "off"
    # real booleans still parse as booleans
    cfg.merge_from_list(["TEST.NO_TEST", "True"])
    assert cfg.TEST.NO_TEST is True


def test_dump_roundtrips_tuples():
    import yaml

    cfg = get_cfg_default()
    text = cfg.dump()  # must not raise on tuple-valued defaults
    loaded = yaml.safe_load(text)
    assert tuple(loaded["INPUT"]["SIZE"]) == tuple(cfg.INPUT.SIZE)


def test_merge_from_list_respects_freeze():
    cfg = get_cfg_default()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.merge_from_list(["SEED", "3"])
