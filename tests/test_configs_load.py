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
