"""Pod-readiness plumbing: per-host input sharding + orbax async ckpt.

VERDICT r1 item 8. Single-process tests on the 8-device CPU mesh; the
process-sharding math is checked by simulating each rank's view and
reassembling the global batch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.parallel.mesh import (globalize_batch, globalize_targets,
                                       make_mesh, process_shard_indices)


def test_process_shard_indices_partition():
    """All ranks' stripes partition the dataset exactly."""
    n, world = 103, 4
    seen = np.concatenate(
        [process_shard_indices(n, r, world) for r in range(world)]
    )
    assert sorted(seen.tolist()) == list(range(n))


def test_loader_local_slices_reassemble_global_batch(tmp_path):
    from dmayolo_tpu.data.loader import DataLoader
    from dmayolo_tpu.data.synthetic import generate
    from dmayolo_tpu.data.datasets import DetectionDataset  # noqa: F401

    yaml_path = generate(str(tmp_path / "shapes"), n_train=16, n_val=4, img_size=64)
    from dmayolo_tpu.data.datasets import check_dataset

    data = check_dataset(yaml_path)
    ds = DetectionDataset(data["train"], img_size=64, augment=False)

    world, bs = 4, 8
    views = []
    for rank in range(world):
        dl = DataLoader(ds, bs, max_targets=8, shuffle=True, seed=7,
                        workers=1, process_index=rank, process_count=world)
        views.append([b for b in dl])
    # every rank saw the same number of batches, each of bs/world rows
    nb = len(views[0])
    assert nb >= 1 and all(len(v) == nb for v in views)
    for j in range(nb):
        rows = [v[j].images for v in views]
        assert all(r.shape[0] == bs // world for r in rows)
        glob = np.concatenate(rows)
        assert glob.shape[0] == bs
        # identical seed => disjoint rows (no duplicate images across ranks)
        flat = glob.reshape(bs, -1)
        assert len(np.unique(flat, axis=0)) == bs


def test_globalize_batch_on_mesh():
    mesh = make_mesh()
    local = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    with mesh:
        g = globalize_batch(mesh, local)
    assert g.shape == (8, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(g), local)
    assert len(g.sharding.device_set) == 8

    tgt = globalize_targets(mesh, {"cls": np.ones((8, 4), np.float32)})
    assert tgt["cls"].shape == (8, 4)


def test_orbax_async_roundtrip_sharded(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dmayolo_tpu.utils.orbax_ckpt import AsyncTrainCheckpointer, restore

    mesh = make_mesh()
    x = jax.device_put(jnp.arange(32.0).reshape(8, 4),
                       NamedSharding(mesh, P("data")))
    tree = {"params": {"w": x}, "step": jnp.ones(())}
    ck = AsyncTrainCheckpointer()
    ck.save(tmp_path / "ckpt", tree, meta={"epoch": 3})
    ck.save(tmp_path / "ckpt", tree, meta={"epoch": 4})  # overwrite path
    ck.close()
    restored, meta = restore(tmp_path / "ckpt", tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(32).reshape(8, 4))
    assert meta["epoch"] == 4


def test_trainer_ckpt_async_save(tmp_path):
    """ckpt_async writes an orbax dir the restore() can read back."""
    from dmayolo_tpu.data.synthetic import generate
    from dmayolo_tpu.train.trainer import Trainer
    from dmayolo_tpu.utils.orbax_ckpt import restore

    yaml_path = generate(str(tmp_path / "shapes"), n_train=8, n_val=8, img_size=128)
    cfg = {
        "nc": 3, "depth_multiple": 0.33, "width_multiple": 0.25,
        "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
        "backbone": [
            [-1, 1, "Conv", [32, 6, 2, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    hyp = {"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 5e-4,
           "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
           "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
           "mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0,
           "degrees": 0, "translate": 0, "scale": 0, "shear": 0,
           "perspective": 0, "flipud": 0, "mixup": 0}
    t = Trainer(cfg, yaml_path, hyp, epochs=1, batch_size=8, img_size=128,
                dtype=jnp.float32, workers=1, out_dir=str(tmp_path / "run"),
                patience=10, val_interval=10, ckpt_async=True)
    t.train()
    like = {
        "params": jax.device_get(t.state.params),
        "stats": jax.device_get(t.state.stats),
        "ema_params": jax.device_get(t.state.ema_params),
        "ema_stats": jax.device_get(t.state.ema_stats),
        "opt_mom": jax.device_get(t.state.opt.mom),
        "opt_vel": jax.device_get(t.state.opt.vel),
    }
    restored, meta = restore(tmp_path / "run" / "last_orbax", like)
    assert meta["epoch"] == 0 and meta["cfg"] == dict(cfg)
    k0 = next(iter(like["params"]))
    np.testing.assert_array_equal(np.asarray(restored["params"][k0]),
                                  np.asarray(like["params"][k0]))
