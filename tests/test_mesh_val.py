"""Data-parallel (mesh) validation: sharding eval batches over the mesh's
'data' axis must reproduce single-device results bit-for-bit — inference
has no cross-device math, so only the sharding/layout plumbing can break.

The serving analog of the train-step DP (SURVEY.md §2.6); the reference has
no multi-device eval at all (val.py is single-GPU).
"""
import numpy as np
import pytest

import jax

from dmayolo_tpu.data.synthetic import generate
from dmayolo_tpu.eval.validator import run_validation
from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.parallel.mesh import make_mesh

CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 2, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "SPPF", [256, 5]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("meshval")
    data = generate(str(root / "shapes"), n_train=4, n_val=8, img_size=128)
    from dmayolo_tpu.data.datasets import check_dataset

    d = check_dataset(data)
    model = DetectionModel(dict(CFG), nc=3)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    return model, params, stats, d


def _run(model, params, stats, d, mesh):
    return run_validation(
        model, params, stats, d["val"], img_size=128, batch_size=8, nc=3,
        conf_thres=0.01, iou_thres=0.6, max_det=50, mesh=mesh,
        dtype=jax.numpy.float32,
    )


def test_mesh_val_matches_single_device(setup):
    model, params, stats, d = setup
    ref = _run(model, params, stats, d, mesh=None)
    mesh = make_mesh(n_data=8)
    got = _run(model, params, stats, d, mesh=mesh)
    assert got.summary() == ref.summary()
    if ref.maps is None:
        assert got.maps is None
    else:
        np.testing.assert_allclose(got.maps, ref.maps, rtol=0, atol=0)


def test_mesh_val_rejects_indivisible_batch(setup):
    model, params, stats, d = setup
    mesh = make_mesh(n_data=8)
    with pytest.raises(AssertionError, match="divisible"):
        run_validation(model, params, stats, d["val"], img_size=128,
                       batch_size=6, nc=3, mesh=mesh)


def test_spatial_sharded_infer_matches_single_device(setup):
    # large-image eval mode: image H additionally sharded over 'spatial' —
    # GSPMD halo-exchanges the convs; detections must match single-device
    import jax.numpy as jnp

    from dmayolo_tpu.eval.validator import make_infer_fn

    model, params, stats, d = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (4, 128, 128, 3), dtype=np.uint8))
    kw = dict(conf_thres=0.01, iou_thres=0.6, max_det=50,
              dtype=jnp.float32, max_nms=512)
    ref = make_infer_fn(model, params, stats, **kw)(x)
    mesh = make_mesh(n_data=4, n_spatial=2)
    got = make_infer_fn(model, params, stats, **kw, mesh=mesh, spatial=True)(x)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_save_hybrid_injects_labels_as_conf1(setup):
    # --save-hybrid: GT labels join predictions before NMS with conf 1.0
    # (ref val.py:228-233) — every GT box must survive into the output
    import jax.numpy as jnp

    from dmayolo_tpu.eval.validator import make_infer_fn

    model, params, stats, d = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8))
    cls = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    box = jnp.asarray([[[0.25, 0.25, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]],
                       [[0.5, 0.5, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0]]])
    mask = jnp.asarray([[True, True], [True, False]])
    kw = dict(conf_thres=0.25, iou_thres=0.6, max_det=20,
              dtype=jnp.float32, max_nms=512)
    infer = make_infer_fn(model, params, stats, **kw, hybrid=True)
    dets, valid = infer(x, cls, box, mask)
    dets, valid = np.asarray(dets), np.asarray(valid)
    # image 0: boxes at (32,32)+-12.8 and (89.6,89.6) with conf 1.0, cls 1/2
    d0 = dets[0][valid[0]]
    ones = d0[d0[:, 4] >= 0.999]
    assert len(ones) == 2 and sorted(ones[:, 5]) == [1.0, 2.0]
    np.testing.assert_allclose(sorted(ones[:, 0]), [19.2, 76.8], atol=1e-3)
    d1 = dets[1][valid[1]]
    ones1 = d1[d1[:, 4] >= 0.999]
    assert len(ones1) == 1 and ones1[0, 5] == 0.0  # padded row dropped
