"""Every bundled model config must parse, build, and stride-probe."""
from pathlib import Path

import pytest

from dmayolo_tpu.graph import DetectionModel

CONFIGS = sorted(
    (Path(__file__).resolve().parents[1] / "dmayolo_tpu/configs/models").glob("*.yaml")
)


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda p: p.stem)
def test_config_builds(cfg):
    m = DetectionModel(cfg)
    assert len(m.stride) >= 2
    assert m.save, "save-list empty — graph has no skip connections?"


def test_bundle_is_complete():
    # all reference configs that the reference itself can build are bundled
    assert len(CONFIGS) >= 65, len(CONFIGS)
