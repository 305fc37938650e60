"""Training driver — the reference train.py:67-575 equivalent.

Orchestrates: model build, loss selection (anchor vs TAL, ref
train.py:360-363), hyp scaling (train.py:330-333), mesh setup, the jitted
train step, per-epoch EMA validation, checkpointing (last/best by
fitness), CSV logging, early stopping.
"""
from __future__ import annotations

import csv
import math
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.datasets import DetectionDataset, check_dataset
from ..data.loader import DataLoader
from ..eval.metrics import fitness
from ..eval.validator import run_validation
from ..graph import DetectionModel
from ..nn.heads import Detect, TDetect
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch
from ..utils.callbacks import Callbacks
from ..utils.checkpoint import load_checkpoint, save_checkpoint, strip_checkpoint
from ..utils.loggers import Loggers
from .loss import ComputeLoss, Targets
from .optim import Schedule, param_groups
from .step import init_train_state, jit_train_step, make_train_step
from .tal import ComputeLossTAL

NBS = 64  # nominal batch size (ref train.py:189)


class EarlyStopping:
    """ref: utils/torch_utils.py:286-306."""

    def __init__(self, patience=30):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch, fi):
        if fi >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fi
        return (epoch - self.best_epoch) >= self.patience


class Trainer:
    def __init__(
        self,
        cfg,                      # model yaml path or dict
        data,                     # dataset yaml path or dict
        hyp: Dict,
        epochs: int = 100,
        batch_size: int = 16,
        img_size: int = 640,
        assignment: str = "anchor",   # 'anchor' | 'tal'  (ref --assignment)
        adam: bool = False,
        linear_lr: bool = False,
        workers: int = 4,
        out_dir: str = "runs/train/exp",
        max_targets: int = 128,
        dtype=jnp.bfloat16,
        mesh=None,
        spatial: bool = False,
        seed: int = 0,
        patience: int = 30,
        val_interval: int = 1,
        train_ungrouped: bool = False,
        warmup_min_iters: int = 1000,
        autoanchor: bool = False,
        multi_scale: bool = False,
        image_weights: bool = False,
        single_cls: bool = False,
        cache_images: bool = False,
        resume_from: Optional[str] = None,
        pretrained: Optional[str] = None,
        accumulate: Optional[int] = None,
        accum_ramp: bool = True,
        ckpt_async: bool = False,
        device_aug: bool = False,
        fastload: bool = False,
        rect: bool = False,
        quad: bool = False,
        nosave: bool = False,
        noval: bool = False,
        freeze: int = 0,
        save_period: int = -1,
        remat: bool = False,
    ):
        self.hyp = dict(hyp)
        self.epochs = epochs
        self.bs = batch_size
        self.img_size = img_size
        self.assignment = assignment
        self.adam = adam
        self.linear_lr = linear_lr
        self.workers = workers
        self.out = Path(out_dir)
        self.max_targets = max_targets
        self.dtype = dtype
        self.spatial = spatial
        self.seed = seed
        self.patience = patience
        self.val_interval = val_interval
        self.ckpt_async = ckpt_async
        self._async_ckptr = None
        self.multi_scale = multi_scale
        self.image_weights = image_weights
        self.single_cls = single_cls
        self.nosave = nosave
        self.noval = noval
        self.save_period = save_period

        self.data = check_dataset(data)
        nc = 1 if single_cls else self.data["nc"]
        # checkpoints must be self-describing: store the path, or the full
        # config dict when built from one
        self.cfg_ref = str(cfg) if isinstance(cfg, (str, Path)) else dict(cfg)
        # hyp 'anchors' (e.g. hyp.finetune_objects365) overrides the yaml
        # anchor count for autoanchor re-clustering, ref train.py:150
        self.model = DetectionModel(cfg, nc=nc, anchors=self.hyp.get("anchors"))
        self.nc = nc
        gs = int(self.model.stride.max())
        from ..cli.common import check_img_size

        img_size = self.img_size = check_img_size(img_size, gs, floor=gs * 2)

        # mesh: default all local devices on the data axis
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = int(np.prod(self.mesh.devices.shape))
        assert batch_size % n_dev == 0, (batch_size, n_dev)

        # hyp scaling (ref train.py:330-339)
        nl = self.model.head.nl
        h = self.hyp
        h["box"] = h.get("box", 0.05) * 3 / nl
        h["cls"] = h.get("cls", 0.5) * nc / 80 * 3 / nl
        h["obj"] = h.get("obj", 1.0) * (img_size / 640) ** 2 * 3 / nl

        from .optim import labels_to_class_weights  # noqa: F401 (used below)

        # device-side augmentation: HSV + lr-flip move INTO the jitted train
        # step (fused with normalise); the host pipeline must not also apply
        # them, so the dataset sees those hyp keys zeroed
        self.device_aug = (
            {"hgain": h.get("hsv_h", 0.015), "sgain": h.get("hsv_s", 0.7),
             "vgain": h.get("hsv_v", 0.4), "fliplr": h.get("fliplr", 0.5)}
            if device_aug else None
        )
        host_h = dict(h)
        if device_aug:
            host_h.update(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, fliplr=0.0)

        # datasets/loaders
        self.train_ds = DetectionDataset(
            self.data["train"], img_size=img_size, augment=True, hyp=host_h,
            stride=int(self.model.stride.max()),
            nc=self.data["nc"], batch_size=batch_size,
            seed=seed, single_cls=single_cls,
            cache_images=(cache_images == "ram" or cache_images is True),
            cache_disk=(cache_images == "disk"),
            rect=rect,  # rectangular training (ref --rect; disables mosaic)
            fastload=fastload,
        )
        self.train_loader = DataLoader(
            self.train_ds, batch_size, max_targets=max_targets,
            shuffle=not rect, workers=workers, seed=seed, quad=quad,
        )
        self.steps_per_epoch = len(self.train_loader)  # loader batches/epoch
        # gradient accumulation toward the nominal batch 64 (ref
        # train.py:189-190, 448-454): the optimizer steps once per
        # `accumulate` loader batches. Clamped to an epoch's batch count so
        # tiny smoke datasets still step. The reference ALSO ramps
        # accumulate 1->nbs/bs during warmup (train.py:412:
        # np.interp(ni, [0, nw], [1, nbs/bs]).round()); we mirror that
        # (accum_ramp, default on): on short-budget runs the ramp is most
        # of the optimizer steps — on the 40-epoch vda benchmark it is
        # ~292 steps vs 120 at fixed cadence, measured +4.3 pt mAP@.5 on
        # the TAL recipe (round-5 notes). Each distinct accumulate value
        # is its own cached XLA program (at most nbs/bs of them).
        self.accumulate = (
            int(accumulate) if accumulate
            else max(round(NBS / batch_size), 1)
        )
        self.accumulate = max(min(self.accumulate, self.steps_per_epoch), 1)
        if rect and self.accumulate > 1:
            # rect buckets letterbox each loader batch to its own shape, so
            # batches in one accumulation group can't be concatenated into a
            # single static-shape XLA step; step every batch instead (the
            # weight-decay scaling below stays consistent with the cadence)
            print(f"--rect: gradient accumulation disabled "
                  f"(was {self.accumulate}; rect batch shapes vary)")
            self.accumulate = 1
        self.weight_decay = h.get("weight_decay", 5e-4) * batch_size * self.accumulate / NBS
        self.class_weights = labels_to_class_weights(self.train_ds.labels, nc)
        self.maps = np.zeros(nc)  # per-class mAP for image-weight resampling

        # resume: load once, up front — the trained anchors must be restored
        # BEFORE the loss captures head.anchors (re-running kmeans here would
        # train against different anchors than the checkpoint's weights)
        self._resume = load_checkpoint(resume_from) if resume_from else None
        resumed_anchors = False
        if self._resume is not None:
            anc = self._resume[1].get("anchors")
            cur = getattr(self.model.head, "anchors", None)
            if anc is not None and cur is not None:
                anc = np.asarray(anc, np.float32)
                if tuple(anc.shape) == tuple(np.shape(cur)):
                    self.model.head.anchors = anc
                    resumed_anchors = True

        # autoanchor before the loss captures head.anchors (ref train.py:318)
        if autoanchor and assignment == "anchor" and not resumed_anchors:
            from .autoanchor import maybe_autoanchor

            maybe_autoanchor(self.model, self.train_ds, img_size,
                             thr=h.get("anchor_t", 4.0))
        if assignment == "anchor" and isinstance(self.model.head, Detect):
            # configs with `anchors: <int>` carry [0,1,2,...] PLACEHOLDER
            # anchors (ref yolo.py:365) that only autoanchor replaces; a
            # zero-sized anchor makes SIoU NaN on the first step in the
            # reference too — fail loudly instead
            a = np.asarray(self.model.head.anchors)
            if a.size and float(a.min()) <= 0:
                raise ValueError(
                    "model has placeholder/degenerate anchors (min size 0) "
                    "— this config declares `anchors: <int>` and needs "
                    "autoanchor to generate real ones; drop --noautoanchor "
                    "or specify anchor pairs in the yaml")

        # loss
        if assignment == "tal":
            assert isinstance(self.model.head, TDetect), "--assignment tal needs a TDetect config"
            self.loss = ComputeLossTAL(self.model.stride, nc=nc, hyp=h)
        else:
            assert isinstance(self.model.head, Detect)
            self.loss = ComputeLoss(self.model.head.anchors, h, nc=nc)

        self.sched = Schedule(
            h, epochs=epochs, steps_per_epoch=self.steps_per_epoch, adam=adam,
            linear=linear_lr, batch_size=batch_size,
            warmup_min_iters=warmup_min_iters, step_scale=self.accumulate,
        )
        labels = param_groups(self.model, train_ungrouped=train_ungrouped)

        def _make_step(acc):
            return make_train_step(
                self.model, self.loss, self.sched, labels,
                weight_decay=self.weight_decay, adam=adam, dtype=dtype,
                accumulate=acc,
                device_aug=self.device_aug,
                freeze=freeze,
                remat=remat,
            )

        step = _make_step(self.accumulate)
        # warmup accumulate ramp (ref train.py:412): active when the user
        # did not pin a cadence and accumulation is in play at all
        self.accum_ramp = bool(accum_ramp and accumulate is None
                               and self.accumulate > 1)
        self._make_step = _make_step
        self._jsteps = {}  # per-accumulate jitted programs (ramp path)
        if freeze:
            print(f"freezing model.0..model.{freeze - 1} (ref train.py:205-212)")
        # donation is disabled everywhere: XLA CPU deadlocks on donated
        # buffers feeding collectives, and the axon TPU backend fails with
        # INVALID_ARGUMENT when the train step donates its state (verified
        # by per-case bisect; retested 2026-08-17, still fails —
        # experiments/exp_donate.py). Revisit when the backend matures.
        self.jstep = jit_train_step(step, mesh=self.mesh, spatial=spatial, donate=False)
        self._spatial_flag = spatial

        # init / resume
        params, stats = self.model.init_with_priors(jax.random.PRNGKey(seed))
        if pretrained:
            trees, _ = load_checkpoint(pretrained)
            src = trees.get("ema_params") or trees["params"]
            matched = 0
            for k in params:
                if k in src and src[k].shape == params[k].shape:
                    params[k] = src[k]
                    matched += 1
            src_s = trees.get("ema_stats") or trees.get("stats", {})
            for k in stats:
                if k in src_s and src_s[k].shape == stats[k].shape:
                    stats[k] = src_s[k]
            print(f"pretrained: matched {matched}/{len(params)} tensors")
        self.state = init_train_state(params, stats)
        self.start_epoch = 0
        self.best_fitness = 0.0
        if resume_from:
            trees, meta = self._resume
            self.state = self.state._replace(
                params=trees["params"], stats=trees["stats"],
                ema_params=trees.get("ema_params", trees["params"]),
                ema_stats=trees.get("ema_stats", trees["stats"]),
                ema_updates=jnp.asarray(meta.get("updates", 0), jnp.int32),
                opt=self.state.opt._replace(
                    step=jnp.asarray(meta.get("step", 0), jnp.int32),
                    mom=trees.get("opt_mom", self.state.opt.mom),
                    vel=trees.get("opt_vel", self.state.opt.vel),
                ),
            )
            self.start_epoch = meta.get("epoch", -1) + 1
            self.best_fitness = meta.get("best_fitness", 0.0)
            print(f"resumed from {resume_from} at epoch {self.start_epoch}")

        self.out.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.out / "results.csv"
        self.loggers = Loggers(self.out)
        self.callbacks = Callbacks()
        # label statistics plot (ref train.py:309 plot_labels)
        try:
            import numpy as _np

            from ..utils.plots import plot_labels

            lbls = [l for l in self.train_ds.labels if len(l)]
            if lbls:
                plot_labels(_np.concatenate(lbls), self.data["names"], self.out)
        except Exception:
            pass

    # -------------------------------------------------------------------
    def _save(self, name: str, epoch: int):
        s = self.state
        meta = {
            "epoch": epoch,
            "best_fitness": float(self.best_fitness),
            "step": int(s.opt.step),
            "updates": int(s.ema_updates),
            "nc": self.nc,
            "cfg": self.cfg_ref,
        }
        anc = getattr(self.model.head, "anchors", None)  # TDetect: anchor-free
        if anc is not None:
            # persist the LIVE anchors (stride units): autoanchor may have
            # replaced the cfg's values (or `anchors: <int>` placeholders) —
            # rebuilding from cfg alone would decode with the wrong ones
            meta["anchors"] = np.asarray(anc, np.float32).tolist()
        if self.ckpt_async:
            # orbax async sharded save: no device_get, no training stall —
            # each host streams the shards it owns (pods); npz path below
            # stays the single-host default
            if self._async_ckptr is None:
                from ..utils.orbax_ckpt import AsyncTrainCheckpointer

                self._async_ckptr = AsyncTrainCheckpointer()
            self._async_ckptr.wait()  # at most one in-flight write
            self._async_ckptr.save(
                self.out / (name + "_orbax"),
                {
                    "params": s.params, "stats": s.stats,
                    "ema_params": s.ema_params, "ema_stats": s.ema_stats,
                    "opt_mom": s.opt.mom, "opt_vel": s.opt.vel,
                },
                meta=meta,
            )
            return
        # one device->host pull per optimizer step, shared by the epoch's
        # best+last saves (the pull, not the disk write, dominates on
        # tunneled TPU); model/EMA stored f16 like the reference
        step = int(s.opt.step)
        cached = getattr(self, "_pull_cache", None)
        if cached is None or cached[0] != step:
            trees = {
                "params": jax.device_get(s.params),
                "stats": jax.device_get(s.stats),
                "ema_params": jax.device_get(s.ema_params),
                "ema_stats": jax.device_get(s.ema_stats),
                "opt_mom": jax.device_get(s.opt.mom),
                "opt_vel": jax.device_get(s.opt.vel),
            }
            self._pull_cache = (step, trees)
        else:
            trees = cached[1]
        save_checkpoint(self.out / name, meta=meta, half=True, **trees)

    def _log_csv(self, row: Dict):
        step = row.pop("epoch")
        self.loggers.log_metrics(row, step)

    def validate(self, use_ema=True):
        s = self.state
        params = s.ema_params if use_ema else s.params
        stats = s.ema_stats if use_ema else s.stats
        return run_validation(
            self.model, jax.device_get(params), jax.device_get(stats),
            self.data["val"], img_size=self.img_size, batch_size=self.bs,
            nc=self.nc, dtype=self.dtype, max_targets=self.max_targets,
            single_cls=self.single_cls,
        )

    def _get_jstep(self, acc: int):
        """Jitted train step for one accumulate value (warmup-ramp path):
        each distinct value is compiled once and cached; the step takes the
        batch counter ni so lr/momentum follow the reference's batch-unit
        warmup curve regardless of the nonlinear opt-step -> ni mapping."""
        if acc not in self._jsteps:
            self._jsteps[acc] = jit_train_step(
                self._make_step(acc), mesh=self.mesh,
                spatial=self._spatial_flag, donate=False, with_ni=True)
        return self._jsteps[acc]

    def train(self, log_every: int = 10):
        stopper = EarlyStopping(self.patience)
        rng = jax.random.PRNGKey(self.seed)
        t_start = time.time()
        self._pending = []  # accumulation group, carried across epochs
        # global batch counter ni (ref train.py:403: ni = i + nb * epoch) —
        # drives the warmup accumulate ramp and, on that path, the lr/
        # momentum schedule in batch units
        self._ni = self.start_epoch * self.steps_per_epoch
        self.callbacks.run("on_train_start")
        for epoch in range(self.start_epoch, self.epochs):
            self.callbacks.run("on_train_epoch_start")
            t0 = time.time()
            running = {}
            nb = 0
            metrics = None
            if self.image_weights:
                # ref train.py:376-384
                from .optim import labels_to_image_weights

                cw = self.class_weights * (1 - self.maps) ** 2 / self.nc
                self.train_loader.sample_weights = labels_to_image_weights(
                    self.train_ds.labels, self.nc, cw
                )
            import random as _random

            _ms_rng = _random.Random(self.seed + epoch)
            gs = int(self.model.stride.max())
            opt_steps = max(self.steps_per_epoch // self.accumulate, 1)
            with self.mesh:
                self.state = replicate_tree(self.mesh, self.state)
                for batch in self.train_loader:
                    # accumulate `accumulate` loader batches per optimizer
                    # step (ref train.py:448-454 ni cadence, carried across
                    # epoch boundaries like the reference's global ni);
                    # during warmup the target ramps 1 -> nbs/bs
                    # (ref train.py:412)
                    self._pending.append(batch)
                    ni = self._ni
                    self._ni += 1
                    acc_target = self.accumulate
                    if self.accum_ramp and ni <= self.sched.nw:
                        acc_target = int(max(1, min(
                            self.accumulate,
                            round(np.interp(ni, [0, self.sched.nw],
                                            [1, self.accumulate])))))
                    if len(self._pending) < acc_target:
                        continue
                    group, self._pending = self._pending, []
                    rng, sub = jax.random.split(rng)
                    if len(group) == 1:
                        images = group[0].images
                        tcls, tbox, tmask = group[0].targets
                    else:
                        images = np.concatenate([b.images for b in group])
                        tcls = np.concatenate([np.asarray(b.targets.cls) for b in group])
                        tbox = np.concatenate([np.asarray(b.targets.box) for b in group])
                        tmask = np.concatenate([np.asarray(b.targets.mask) for b in group])
                    if self.multi_scale:
                        # bucketed random resize (ref train.py:425-431); a
                        # small bucket set bounds XLA recompiles
                        import cv2 as _cv2

                        scale = _ms_rng.choice([0.5, 0.75, 1.0, 1.25, 1.5])
                        sz = int(round(self.img_size * scale / gs) * gs)
                        if sz != images.shape[1]:
                            images = np.stack([
                                _cv2.resize(im, (sz, sz), interpolation=_cv2.INTER_LINEAR)
                                for im in images
                            ])
                    imgs = shard_batch(self.mesh, jnp.asarray(images), spatial=self.spatial)
                    tgt = Targets(
                        *(
                            jax.device_put(jnp.asarray(t), NamedSharding(self.mesh, P("data")))
                            for t in (tcls, tbox, tmask)
                        )
                    )
                    if self.accum_ramp:
                        self.state, metrics = self._get_jstep(len(group))(
                            self.state, imgs, tgt, sub,
                            jnp.asarray(ni, jnp.float32))
                    else:
                        self.state, metrics = self.jstep(self.state, imgs, tgt, sub)
                    nb += 1
                    if nb % log_every == 0 or nb == opt_steps:
                        m = {k: float(v) for k, v in metrics.items()}
                        running = m
                        print(
                            f"epoch {epoch} [{nb}/{opt_steps}] "
                            + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
                            flush=True,
                        )

            if metrics is not None:
                # refresh from the epoch's true last optimizer step (the
                # ramp makes the printed [nb/opt_steps] estimate approximate)
                running = {k: float(v) for k, v in metrics.items()}
            row = {"epoch": epoch, **{f"train/{k}": v for k, v in running.items()}}
            final_epoch = epoch == self.epochs - 1
            if ((epoch + 1) % self.val_interval == 0 or final_epoch) \
                    and (not self.noval or final_epoch):  # ref --noval train.py:475
                res = self.validate()
                if res.maps is not None:
                    self.maps = res.maps
                print(f"epoch {epoch} val: {res.summary()}", flush=True)
                fi = float(
                    fitness(np.array([[res.mp, res.mr, res.map50, res.map]]))[0]
                )
                if fi > self.best_fitness:
                    self.best_fitness = fi
                    if not self.nosave:  # ref --nosave train.py:508
                        self._save("best", epoch)
                row.update(
                    {
                        "metrics/precision": res.mp,
                        "metrics/recall": res.mr,
                        "metrics/mAP_0.5": res.map50,
                        "metrics/mAP_0.5:0.95": res.map,
                        "fitness": fi,
                    }
                )
                if stopper(epoch, fi):
                    print(f"early stopping at epoch {epoch}")
                    self._save("last", epoch)
                    break
            if not self.nosave or final_epoch:
                self._save("last", epoch)
            if self.save_period > 0 and (epoch + 1) % self.save_period == 0:
                self._save(f"epoch{epoch}", epoch)  # ref --save-period train.py:531
            self._pull_cache = None  # host copy only needed for this epoch's saves
            self.callbacks.run("on_model_save")
            row["time_s"] = time.time() - t0
            self._log_csv(row)
            self.callbacks.run("on_fit_epoch_end", row, epoch)

        if self._async_ckptr is not None:  # drain the in-flight orbax write
            self._async_ckptr.close()
        # strip BOTH like the reference (train.py:553-557): a stripped last
        # is the "finished" marker tools/resume_all.py keys on — otherwise an
        # early-stopped run would be re-resumed forever
        for name in ("last", "best"):
            if (self.out / f"{name}.npz").exists():
                strip_checkpoint(self.out / name)
        self.loggers.finalize()
        self.callbacks.run("on_train_end")
        print(f"training done in {(time.time()-t_start)/3600:.2f}h; best fitness {self.best_fitness:.4f}")
        return self.best_fitness
