"""End-to-end training-trajectory parity vs the torch reference.

VERDICT r1 item 3: forward, loss, optimizer, EMA and BN-stat updates are
each golden-tested in isolation — this test proves their COMPOSITION over
N real train steps matches: identical init weights, identical batches,
10 SGD(+EMA) steps on CPU, per-step losses and final parameter/EMA deltas
compared for BOTH the anchor-SIoU and TAL paths (and the Adam optimizer).

Reference hot loop: train.py:400-463 (warmup interp 408-422, backward 445,
step+EMA 448-454); optimizer groups train.py:197-222; ModelEMA
torch_utils.py:309-343.
"""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models.yolo import Model as RefModel  # noqa: E402
from utils.loss import ComputeLoss as RefComputeLoss  # noqa: E402
from utils.tal import ComputeLoss_TAL as RefComputeLossTAL  # noqa: E402
from utils.torch_utils import ModelEMA  # noqa: E402

from dmayolo_tpu.graph import DetectionModel  # noqa: E402
from dmayolo_tpu.train.loss import ComputeLoss, Targets  # noqa: E402
from dmayolo_tpu.train.optim import Schedule, param_groups  # noqa: E402
from dmayolo_tpu.train.step import init_train_state, make_train_step  # noqa: E402
from dmayolo_tpu.train.tal import ComputeLossTAL  # noqa: E402
from dmayolo_tpu.utils.torch_import import import_torch_state  # noqa: E402

BS, IMG, NC, STEPS, NW, EPOCHS, SPE, M = 2, 96, 3, 10, 8, 3, 10, 16

HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 0.8, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
}
WD_SCALED = HYP["weight_decay"] * BS * 1 / 64  # accumulate=1, ref train.py:191

ANCHOR_CFG = {
    "nc": NC, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [16, 6, 2, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [-1, 1, "Conv", [48, 3, 2]],    # P3/8
        [-1, 1, "Conv", [64, 3, 2]],    # P4/16
        [-1, 1, "Conv", [64, 3, 2]],    # P5/32
    ],
    "head": [[[3, 4, 5], 1, "Detect", ["nc", "anchors"]]],
}

TAL_CFG = {
    "nc": NC, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
    "backbone": ANCHOR_CFG["backbone"],
    "head": [[[3, 4, 5], 1, "TDetect", ["nc"]]],
}


def _fixed_batches(seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (STEPS, BS, 3, IMG, IMG)).astype(np.float32)
    flats = []
    for _ in range(STEPS):
        n = int(rng.integers(4, 10))
        img_i = rng.integers(0, BS, n)
        cls = rng.integers(0, NC, n)
        cx, cy = rng.uniform(0.25, 0.75, (2, n))
        w, h = rng.uniform(0.08, 0.3, (2, n))
        flats.append(np.stack([img_i, cls, cx, cy, w, h], 1).astype(np.float32))
    return imgs, flats


def _dense(flat):
    cls = np.zeros((BS, M), np.float32)
    box = np.zeros((BS, M, 4), np.float32)
    mask = np.zeros((BS, M), bool)
    fill = np.zeros(BS, int)
    for row in flat:
        b = int(row[0])
        j = fill[b]
        cls[b, j], box[b, j], mask[b, j] = row[1], row[2:6], True
        fill[b] += 1
    return Targets(jnp.asarray(cls), jnp.asarray(box), jnp.asarray(mask))


def _lf(epoch):
    """one_cycle(1, lrf, epochs) (ref train.py:234)."""
    return ((1 - np.cos(epoch * np.pi / EPOCHS)) / 2) * (HYP["lrf"] - 1) + 1


def _run_reference(ref_model, loss_obj, imgs, flats, adam):
    """Minimal faithful re-run of the reference hot loop (train.py:400-463)."""
    g0, g1, g2 = [], [], []  # ref train.py:197-211
    for v in ref_model.modules():
        if hasattr(v, "bias") and isinstance(v.bias, torch.nn.Parameter):
            g2.append(v.bias)
        if isinstance(v, torch.nn.BatchNorm2d):
            g0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, torch.nn.Parameter):
            g1.append(v.weight)
    if adam:  # ref train.py:217
        opt = torch.optim.Adam(g0, lr=3e-4, betas=(HYP["momentum"], 0.999))
    else:
        opt = torch.optim.SGD(g0, lr=HYP["lr0"], momentum=HYP["momentum"],
                              nesterov=True)
    opt.add_param_group({"params": g1, "weight_decay": WD_SCALED})
    opt.add_param_group({"params": g2})
    for g in opt.param_groups:  # LambdaLR stamps this (train.py:235)
        g["initial_lr"] = g["lr"]

    ema = ModelEMA(ref_model)
    ref_model.train()
    losses = []
    for ni in range(STEPS):
        epoch = 0  # 10 steps < one epoch
        if ni <= NW:  # warmup interp, ref train.py:408-422
            xi = [0, NW]
            for j, x in enumerate(opt.param_groups):
                x["lr"] = np.interp(
                    ni, xi,
                    [HYP["warmup_bias_lr"] if j == 2 else 0.0,
                     x["initial_lr"] * _lf(epoch)],
                )
                if "momentum" in x:
                    x["momentum"] = np.interp(
                        ni, xi, [HYP["warmup_momentum"], HYP["momentum"]]
                    )
        else:
            for x in opt.param_groups:
                x["lr"] = x["initial_lr"] * _lf(epoch)
        pred = ref_model(torch.tensor(imgs[ni]))
        loss, _ = loss_obj(pred, torch.tensor(flats[ni]))
        loss.backward()
        opt.step()
        opt.zero_grad()
        ema.update(ref_model)
        losses.append(float(loss))
    return losses, ema


def _run_ours(ours, params, stats, loss_obj, imgs, flats, adam):
    sched = Schedule(HYP, epochs=EPOCHS, steps_per_epoch=SPE, adam=adam,
                     batch_size=BS, warmup_min_iters=NW)
    step = make_train_step(ours, loss_obj, sched, param_groups(ours),
                           weight_decay=WD_SCALED, adam=adam,
                           dtype=jnp.float32, accumulate=1)
    jstep = jax.jit(step)
    state = init_train_state(params, stats)
    key = jax.random.PRNGKey(0)
    losses = []
    for ni in range(STEPS):
        x = jnp.asarray(imgs[ni].transpose(0, 2, 3, 1))
        state, met = jstep(state, x, _dense(flats[ni]), key)
        losses.append(float(met["loss"]))
    return losses, state


def _delta_check(ref_final_sd, ours_model, init_params, init_stats,
                 final_params, final_stats, tag, tol=0.05):
    """Compare per-tensor UPDATE deltas (final - init) between frameworks —
    raw-value comparison would pass trivially when updates are small."""
    ref_p, ref_s, _ = import_torch_state(ours_model, ref_final_sd)
    worst = (0.0, None)
    moved = 0.0
    for tree_ref, tree_init, tree_fin in (
        (ref_p, init_params, final_params),
        (ref_s, init_stats, final_stats),
    ):
        for k in tree_fin:
            d_ours = np.asarray(tree_fin[k], np.float64) - np.asarray(tree_init[k], np.float64)
            d_ref = np.asarray(tree_ref[k], np.float64) - np.asarray(tree_init[k], np.float64)
            n_ref = np.linalg.norm(d_ref)
            moved += n_ref
            err = np.linalg.norm(d_ours - d_ref) / (n_ref + 1e-10)
            if n_ref > 1e-9 and err > worst[0]:
                worst = (err, k)
    assert moved > 1e-6, f"{tag}: training moved nothing"
    assert worst[0] < tol, f"{tag}: worst relative delta err {worst[0]:.4f} @ {worst[1]}"


def _trajectory(cfg, make_ref_loss, make_our_loss, adam, tag, loss_rtol=1e-3,
                allow_flips=False, delta_tol=0.05):
    torch.manual_seed(0)
    ref = RefModel(copy.deepcopy(cfg))
    ref.hyp = dict(HYP)
    ref.gr = 1.0
    ours = DetectionModel(copy.deepcopy(cfg))
    params, stats, report = import_torch_state(ours, ref.state_dict())
    assert not report["missing"] and not report["mismatched"]
    init_params = {k: np.asarray(v).copy() for k, v in params.items()}
    init_stats = {k: np.asarray(v).copy() for k, v in stats.items()}

    imgs, flats = _fixed_batches()
    ref_losses, ema = _run_reference(ref, make_ref_loss(ref), imgs, flats, adam)
    our_losses, state = _run_ours(ours, params, stats, make_our_loss(ours),
                                  imgs, flats, adam)

    if allow_flips:
        # TAL assignment is discrete (topk/argmax over the align metric):
        # a ~1e-6 score difference can flip one anchor's assignment and jump
        # a single step's loss, after which the trajectories re-converge.
        # Require tight agreement on most steps and bounded excursions.
        err = np.abs(np.asarray(our_losses) - np.asarray(ref_losses)) / np.abs(ref_losses)
        assert float(np.median(err)) < loss_rtol, (tag, err)
        assert float(np.mean(err < loss_rtol)) >= 0.8, (tag, err)
        assert float(err.max()) < 0.15, (tag, err)
    else:
        np.testing.assert_allclose(our_losses, ref_losses, rtol=loss_rtol)
    _delta_check(ref.state_dict(), ours, init_params, init_stats,
                 state.params, state.stats, tag + ":model", tol=delta_tol)
    _delta_check(ema.ema.state_dict(), ours, init_params, init_stats,
                 state.ema_params, state.ema_stats, tag + ":ema", tol=delta_tol)


def test_anchor_siou_sgd_trajectory():
    _trajectory(
        ANCHOR_CFG,
        lambda ref: RefComputeLoss(ref),
        lambda ours: ComputeLoss(ours.head.anchors, HYP, nc=NC),
        adam=False, tag="anchor-sgd",
    )


def test_anchor_siou_adam_trajectory():
    _trajectory(
        ANCHOR_CFG,
        lambda ref: RefComputeLoss(ref),
        lambda ours: ComputeLoss(ours.head.anchors, HYP, nc=NC),
        adam=True, tag="anchor-adam",
    )


def test_tal_sgd_trajectory():
    _trajectory(
        TAL_CFG,
        lambda ref: RefComputeLossTAL(ref),
        lambda ours: ComputeLossTAL(ours.stride, nc=NC, hyp=HYP),
        adam=False, tag="tal-sgd", loss_rtol=2e-3, allow_flips=True,
        delta_tol=0.25,
    )
