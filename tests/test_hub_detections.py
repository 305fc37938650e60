"""Hub Detections results-object surface (ref models/common.py:795-891):
xyxy/xywh/xyxyn/xywhn views, the canonical results.pandas().xyxy[0]
idiom, tolist(), render/save/crop/print.
"""
import numpy as np
import pytest

from dmayolo_tpu.hub import Detections


def _mk(n_imgs=2, seed=0):
    rng = np.random.default_rng(seed)
    imgs, dets = [], []
    for i in range(n_imgs):
        h, w = 80 + 20 * i, 120 + 10 * i
        imgs.append(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        k = 3 + i
        xy = rng.uniform(0, 60, (k, 2))
        wh = rng.uniform(5, 30, (k, 2))
        d = np.concatenate([xy, xy + wh, rng.uniform(0.3, 1, (k, 1)),
                            rng.integers(0, 2, (k, 1)).astype(float)], 1)
        dets.append(d.astype(np.float32))
    return Detections(imgs, dets, [f"{i}.jpg" for i in range(n_imgs)], ["a", "b"])


def test_box_views_match_reference_math():
    r = _mk()
    for i, (im, d) in enumerate(zip(r.imgs, r.xyxy)):
        h, w = im.shape[:2]
        # xywh: center + size (ref xyxy2xywh)
        want = d.copy()
        want[:, 0] = (d[:, 0] + d[:, 2]) / 2
        want[:, 1] = (d[:, 1] + d[:, 3]) / 2
        want[:, 2] = d[:, 2] - d[:, 0]
        want[:, 3] = d[:, 3] - d[:, 1]
        np.testing.assert_allclose(r.xywh[i], want, rtol=1e-6)
        # normalized views divide by (w, h, w, h, 1, 1) — ref common.py:800
        gn = np.array([w, h, w, h, 1, 1], np.float32)
        np.testing.assert_allclose(r.xyxyn[i], d / gn, rtol=1e-6)
        np.testing.assert_allclose(r.xywhn[i], want / gn, rtol=1e-6)


def test_pandas_idiom():
    pd = pytest.importorskip("pandas")
    r = _mk()
    p = r.pandas()
    df = p.xyxy[0]
    assert list(df.columns) == ["xmin", "ymin", "xmax", "ymax",
                                "confidence", "class", "name"]
    assert len(df) == len(r.xyxy[0])
    assert set(df["name"]) <= {"a", "b"}
    dfw = p.xywhn[1]
    assert list(dfw.columns) == ["xcenter", "ycenter", "width", "height",
                                 "confidence", "class", "name"]
    assert (dfw[["xcenter", "ycenter", "width", "height"]].values <= 1.0 + 1e-6).all()
    # original object unchanged (pandas() returns a copy)
    assert isinstance(r.xyxy[0], np.ndarray)
    assert isinstance(df, pd.DataFrame)


def test_tolist_and_len():
    r = _mk()
    items = r.tolist()
    assert len(r) == 2 and len(items) == 2
    for i, it in enumerate(items):
        assert len(it) == 1
        np.testing.assert_array_equal(it.xyxy[0], r.xyxy[i])
        assert it.files == [r.files[i]]


def test_render_save_crop_print(tmp_path, capsys):
    r = _mk()
    rendered = r.render()
    assert len(rendered) == 2 and rendered[0].shape == r.imgs[0].shape
    assert any((rendered[0] != r.imgs[0]).any() for _ in [0])  # boxes drawn
    out = r.save(tmp_path / "s")
    assert sorted(p.name for p in out.iterdir()) == ["0.jpg", "1.jpg"]
    crops = r.crop(save_dir=tmp_path / "c")
    assert len(crops) == sum(len(d) for d in r.xyxy)
    assert all(c["im"].size > 0 for c in crops)
    r.print()
    assert "image 1/2" in capsys.readouterr().out


def test_autoshape_end_to_end(tmp_path):
    """hub.load -> AutoShape(path|array) -> Detections with real filenames
    and the pandas idiom (covers the restapi non-batched path)."""
    import cv2
    import jax

    from dmayolo_tpu import hub
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint
    from tests.test_e2e_train import TINY_CFG

    m = DetectionModel(TINY_CFG)
    p, s = m.init_with_priors(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "w.npz", params=p, stats=s,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})

    rng = np.random.default_rng(0)
    img_path = tmp_path / "scene.jpg"
    cv2.imwrite(str(img_path), rng.integers(0, 255, (100, 140, 3), dtype=np.uint8))

    model = hub.load(str(tmp_path / "w.npz"))
    model.conf = 1e-5
    r = model([str(img_path), rng.integers(0, 255, (90, 90, 3), dtype=np.uint8)],
              size=128)
    assert r.files[0] == "scene.jpg" and r.files[1] == "image1.jpg"
    dfs = r.pandas().xyxy
    assert len(dfs) == 2 and list(dfs[0].columns)[:4] == ["xmin", "ymin", "xmax", "ymax"]
