"""VisDrone-analog generator (docs/PARITY.md link 7): the offline
stand-in for the fork's target dataset (ref data/VisDrone.yaml:1,
train.sh:1-3). Checks the *statistical profile* the benchmark depends on
— tiny-object sizes, per-image crowding, 10-way class imbalance — and
that the output trains through the real dataset/loader stack.
"""
import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

from dmayolo_tpu.data.synthetic import (VISDRONE_CLASSES, VISDRONE_FREQ,
                                        generate_visdrone_analog)


@pytest.fixture(scope="module")
def vda(tmp_path_factory):
    root = tmp_path_factory.mktemp("vda")
    path = generate_visdrone_analog(root, n_train=6, n_val=10, img_size=384,
                                    seed=5)
    return root, path


def _labels(root, split):
    out = []
    for f in sorted((root / "labels" / split).glob("*.txt")):
        out.append(np.loadtxt(f, ndmin=2))
    return out


def test_yaml_and_layout(vda):
    root, path = vda
    data = yaml.safe_load(path.read_text())
    assert data["nc"] == 10 and data["names"] == VISDRONE_CLASSES
    assert len(list((root / "images" / "val").glob("*.jpg"))) == 10
    assert len(_labels(root, "val")) == 10


def test_profile_tiny_crowded_imbalanced(vda):
    root, _ = vda
    labs = _labels(root, "val") + _labels(root, "train")
    counts = [len(r) for r in labs]
    assert min(counts) >= 25, "crowding: every image is dense"
    rows = np.concatenate([r for r in labs if len(r)])
    # normalised, in-bounds boxes
    assert rows[:, 1:].min() >= 0 and rows[:, 1:].max() <= 1
    sizes = np.maximum(rows[:, 3], rows[:, 4]) * 384
    assert np.median(sizes) < 16, "tiny-object profile"
    assert (sizes < 32).mean() > 0.9
    hist = np.bincount(rows[:, 0].astype(int), minlength=10)
    assert hist.argmax() == 3, "car dominates (VisDrone imbalance)"
    assert hist[3] > 5 * max(hist[6], hist[7], 1), "rare classes are rare"
    # drawn frequencies track the target profile for the dominant classes
    freq = hist / hist.sum()
    assert abs(freq[3] - VISDRONE_FREQ[3]) < 0.1


def test_determinism(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    generate_visdrone_analog(a, n_train=2, n_val=2, img_size=256, seed=9)
    generate_visdrone_analog(b, n_train=2, n_val=2, img_size=256, seed=9)
    for split in ("train", "val"):
        for f in (a / "labels" / split).glob("*.txt"):
            assert f.read_text() == (b / "labels" / split / f.name).read_text()
        for f in (a / "images" / split).glob("*.jpg"):
            assert f.read_bytes() == (b / "images" / split / f.name).read_bytes()


def test_trains_through_dataset_stack(vda):
    root, _ = vda
    from dmayolo_tpu.cli.common import load_hyp
    from dmayolo_tpu.data.datasets import DetectionDataset
    from dmayolo_tpu.data.loader import DataLoader

    ds = DetectionDataset(str(root / "images" / "train"), img_size=384,
                          augment=True, hyp=load_hyp("scratch"), nc=10,
                          batch_size=2)
    dl = DataLoader(ds, batch_size=2, workers=1, max_targets=256, seed=0)
    b = next(iter(dl))
    assert b.images.shape == (2, 384, 384, 3) and b.images.dtype == np.uint8
    assert b.targets.mask.any(), "augmented batch still carries labels"
