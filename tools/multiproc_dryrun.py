#!/usr/bin/env python3
"""REAL 2-process jax.distributed execution of the multi-host path.

Round-3 verdict item 4: the multi-host input sharding (DataLoader
process striping + mesh.globalize_batch) and host-0-only ckpt/log were
only ever tested in-process by patching process_index.  This script
EXECUTES them: a coordinator spawns N child processes on this host, each
child runs `jax.distributed.initialize` (coordinator on localhost) with
4 virtual CPU devices, and together they drive one jitted train step +
a sharded eval forward through `make_array_from_process_local_data` with
real per-process sharding, then rank 0 alone writes the checkpoint.

This is the TPU-native analogue of the reference's DDP process launch
(ref train.py:61-63, 698: LOCAL_RANK/RANK/WORLD_SIZE env +
init_process_group) — except the model code has no rank conditionals;
only I/O (loader striping, ckpt/log) consults process_index.

    python tools/multiproc_dryrun.py            # coordinator: spawn 2
    python tools/multiproc_dryrun.py --world 2  # same, explicit
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]],
}

HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
}


def child(args):
    # CPU platform + 4 virtual devices per process, BEFORE jax import
    from dmayolo_tpu.cpu_mesh_flags import apply_cpu_mesh_flags

    apply_cpu_mesh_flags(n_devices=4)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.world,
        process_id=args.child,
    )
    pi, pc = jax.process_index(), jax.process_count()
    assert pc == args.world, (pc, args.world)
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * args.world
    print(f"[rank {pi}] up: {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices", flush=True)

    # Create the Gloo context NOW, while ranks are tightly aligned (just
    # past import): its key-exchange window is ~30s, and on a 1-core host
    # the big train-step compiles later skew the ranks far beyond that.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multiproc_dryrun_boot")
    print(f"[rank {pi}] gloo context up", flush=True)

    import numpy as np
    import jax.numpy as jnp

    from dmayolo_tpu.data.datasets import DetectionDataset, check_dataset
    from dmayolo_tpu.data.loader import DataLoader
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.parallel.mesh import (globalize_batch, globalize_targets,
                                           make_mesh)
    from dmayolo_tpu.train.loss import ComputeLoss
    from dmayolo_tpu.train.optim import Schedule, param_groups
    from dmayolo_tpu.train.step import (init_train_state, jit_train_step,
                                        make_train_step)

    import yaml

    cfg_path = os.path.join(args.workdir, "tiny.yaml")
    if pi == 0 and not os.path.exists(cfg_path):
        with open(cfg_path, "w") as f:
            yaml.safe_dump(CFG, f)
    while not os.path.exists(cfg_path):
        time.sleep(0.2)

    model = DetectionModel(cfg_path, nc=3)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    state = init_train_state(params, stats)

    data = check_dataset(os.path.join(args.workdir, "shapes", "shapes.yaml"))
    ds = DetectionDataset(data["train"], img_size=128, augment=False, nc=3)
    gbs = 8
    # per-process loader: each host loads ONLY its stripe of the dataset
    # and its gbs/pc rows of every global batch (DistributedSampler analog)
    dl = DataLoader(ds, gbs, max_targets=16, shuffle=True, seed=0, workers=1,
                    process_index=pi, process_count=pc)

    mesh = make_mesh()  # all 8 global devices on 'data'
    loss = ComputeLoss(model.head.anchors, HYP, nc=3)
    sched = Schedule(HYP, epochs=1, steps_per_epoch=max(1, len(dl)))
    step = jit_train_step(
        make_train_step(model, loss, sched, param_groups(model),
                        weight_decay=5e-4, dtype=jnp.float32),
        mesh=mesh, donate=False)

    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    key = jax.random.PRNGKey(7)

    n_steps = 0
    with mesh:
        for b in dl:
            assert b.images.shape[0] == gbs // pc, b.images.shape
            imgs = globalize_batch(
                mesh, b.images.astype(np.float32) / 255.0)
            tgts = globalize_targets(mesh, b.targets)
            assert imgs.shape[0] == gbs  # global logical shape
            state, met = step(state, imgs, tgts, key)
            n_steps += 1
            if n_steps >= 2:
                break
    lossv = float(np.asarray(met["loss"].addressable_shards[0].data))
    print(f"[rank {pi}] {n_steps} sharded train steps, loss={lossv:.4f}",
          flush=True)
    assert np.isfinite(lossv)

    # sharded eval forward (batch on 'data'; params replicated)
    fwd = jax.jit(
        lambda p, s, x: model.decode(model.apply(p, s, x)),
        in_shardings=(None, None, NamedSharding(mesh, P("data"))),
    )
    with mesh:
        dec = fwd(state.params, state.stats,
                  globalize_batch(mesh, np.zeros((8, 128, 128, 3), np.float32)))
        dec_ok = bool(np.isfinite(
            np.asarray(dec.addressable_shards[0].data)).all())
    print(f"[rank {pi}] sharded eval decode ok={dec_ok}", flush=True)
    assert dec_ok

    # host-0-only checkpoint + log — the reference's RANK in [-1,0] guard
    # (train.py:103,457,469) lives ONLY here, not in model code
    if pi == 0:
        from dmayolo_tpu.utils.checkpoint import save_checkpoint

        out = os.path.join(args.workdir, "last.npz")
        save_checkpoint(out, params=jax.device_get(state.params),
                        stats=jax.device_get(state.stats),
                        meta={"epoch": 0, "best_fitness": 0.0})
        print(f"[rank 0] checkpoint written: {out}", flush=True)

    multihost_utils.sync_global_devices("multiproc_dryrun_done")
    print(f"[rank {pi}] done", flush=True)
    jax.distributed.shutdown()


def coordinator(args):
    workdir = args.workdir or tempfile.mkdtemp(prefix="multiproc_dryrun_")
    os.makedirs(workdir, exist_ok=True)
    shapes = os.path.join(workdir, "shapes")
    if not os.path.exists(os.path.join(shapes, "shapes.yaml")):
        from dmayolo_tpu.data.synthetic import generate

        generate(shapes, n_train=16, n_val=4, img_size=128)

    procs, logs = [], []
    for r in range(args.world):
        log = open(os.path.join(workdir, f"rank{r}.log"), "w")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # children set their own
        p = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), "--child",
             str(r), "--world", str(args.world), "--port", str(args.port),
             "--workdir", workdir],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        procs.append(p)
        logs.append(log)

    deadline = time.time() + args.timeout
    rcs = [None] * args.world
    while time.time() < deadline and any(rc is None for rc in rcs):
        for i, p in enumerate(procs):
            if rcs[i] is None:
                rcs[i] = p.poll()
        time.sleep(1)
    for i, p in enumerate(procs):
        if rcs[i] is None:
            p.kill()
            rcs[i] = "timeout"
    for log in logs:
        log.close()

    ok = all(rc == 0 for rc in rcs)
    text = ""
    for r in range(args.world):
        with open(os.path.join(workdir, f"rank{r}.log")) as f:
            t = f.read()
        text += t
        print(f"--- rank {r} (rc={rcs[r]}) ---")
        print("\n".join(t.splitlines()[-6:]))
    ok = ok and all(f"[rank {r}] done" in text for r in range(args.world))
    ok = ok and os.path.exists(os.path.join(workdir, "last.npz"))
    print(f"\nmultiproc_dryrun: world={args.world} "
          f"{'OK' if ok else 'FAILED'} (workdir {workdir})")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--world", type=int, default=2)
    ap.add_argument("--port", type=int, default=47831)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    if args.child is not None:
        child(args)
        return 0
    return coordinator(args)


if __name__ == "__main__":
    sys.exit(main())
