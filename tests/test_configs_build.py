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


REF_BROKEN = {
    # the 4 configs broken in the reference itself (author channel-arithmetic
    # mistakes); they must fail to build here too, for the same class of
    # reason: bad conv group/channel math or wrong constructor arity.
    "CASMM": ValueError,       # SMMConv feeds mismatched conv groups
    "CASMMsiou": ValueError,   # same backbone as CASMM (BAM head variant)
    "CMCA": TypeError,         # Concat of unequal spatial dims (stride bug)
    "adaptadd": TypeError,     # AdaptADD used with 1 input, needs 2 dims
}


def test_anchor_presets_match_reference():
    """configs/anchors.yaml carries the COCO anchor presets verbatim
    (reference models/hub/anchors.yaml) in usable `anchors:` row format."""
    import yaml

    ours_path = Path(__file__).resolve().parents[1] / "dmayolo_tpu/configs/anchors.yaml"
    ours = yaml.safe_load(ours_path.read_text())
    assert set(ours) == {
        "anchors_p5_640", "anchors_p6_640", "anchors_p6_1280", "anchors_p6_1920",
        "anchors_p7_640", "anchors_p7_1280", "anchors_p7_1920",
    }
    for key, rows in ours.items():
        nl = int(key.split("_")[1][1:]) - 2  # p5 -> 3 levels (P3..P5), etc.
        assert len(rows) == nl and all(len(r) == 6 for r in rows), key

    ref_path = Path("/root/reference/models/hub/anchors.yaml")
    if ref_path.exists():
        ref = yaml.safe_load(ref_path.read_text().replace("  #", " #"))
        for key in ours:
            assert ours[key] == ref[key], key


@pytest.mark.parametrize("name", sorted(REF_BROKEN), ids=str)
def test_reference_broken_configs_fail_identically(name):
    ref = Path("/root/reference/models") / f"{name}.yaml"
    if not ref.exists():
        pytest.skip("reference tree not mounted")
    with pytest.raises(REF_BROKEN[name]):
        DetectionModel(ref)
