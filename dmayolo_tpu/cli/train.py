"""Training CLI — same flag surface as reference train.py:581-640.

Example (the DMA VisDrone recipe, ref train.sh:1):
    python -m dmayolo_tpu.cli.train --img 1536 --adam --batch-size 4 \
        --epochs 200 --data VisDrone.yaml --hyp visdrone \
        --cfg ablation-ca-scconv-sppfcspc.yaml
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from .common import increment_path, load_hyp, resolve_config


def build_parser():
    p = argparse.ArgumentParser("dmayolo-train")
    # not argparse-required: a bare `--resume <ckpt>` restores cfg/data from
    # the run's own opt.yaml (ref train.py:657-669); checked after parsing
    p.add_argument("--cfg", type=str, default=None, help="model yaml")
    p.add_argument("--data", type=str, default=None, help="dataset yaml")
    p.add_argument("--hyp", type=str, default="scratch", help="hyp yaml")
    p.add_argument("--weights", type=str, default="", help="pretrained npz checkpoint")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16,
                   help="-1 = autobatch from device memory (ref autobatch.py)")
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640, dest="imgsz")
    p.add_argument("--adam", action="store_true")
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--assignment", type=str, default="anchor", choices=["anchor", "tal"])
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", type=str, default="runs/train")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--resume", type=str, default="", nargs="?", const="auto")
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noautoanchor", action="store_true")
    p.add_argument("--ckpt-async", action="store_true",
                   help="orbax async sharded checkpoints (pod-scale saves)")
    p.add_argument("--device-aug", action="store_true",
                   help="fuse HSV jitter + lr-flip into the jitted train "
                        "step (host ships raw uint8)")
    p.add_argument("--fastload", action="store_true",
                   help="native C++ JPEG decode+resize input path "
                        "(native/fastload.cpp; cv2 fallback per file)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise per-layer activations in backward "
                        "(jax.checkpoint): ~1 extra forward of FLOPs for "
                        "O(depth) less HBM — fits larger batch/imgsz. "
                        "Auto-enabled at --imgsz >= 1024, where the smaller "
                        "live-set also SPEEDS UP the step (measured 1536px "
                        "bs4: 435 -> 369 ms); --no-remat opts out")
    p.add_argument("--no-remat", action="store_true",
                   help="disable the automatic remat at imgsz >= 1024")
    p.add_argument("--max-targets", type=int, default=128)
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--spatial-shard", action="store_true",
                   help="also shard image H over the mesh (large-image mode)")
    p.add_argument("--train-ungrouped", action="store_true",
                   help="also optimize params the reference leaves out")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu (default: auto)")
    p.add_argument("--evolve", type=int, nargs="?", const=300, default=0,
                   help="evolve hyperparameters for N generations")
    p.add_argument("--multi-scale", action="store_true", help="bucketed random train sizes")
    p.add_argument("--single-cls", action="store_true", help="train as single-class")
    p.add_argument("--cache", type=str, nargs="?", const="ram", default=None,
                   choices=["ram", "disk"], help="cache images in ram or on disk")
    p.add_argument("--rect", action="store_true", help="rectangular training")
    p.add_argument("--quad", action="store_true", help="quad dataloader (collate_fn4)")
    p.add_argument("--nosave", action="store_true", help="only save final checkpoint")
    p.add_argument("--noval", action="store_true", help="only validate final epoch")
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="label smoothing epsilon (overrides hyp)")
    p.add_argument("--freeze", type=int, default=0,
                   help="freeze first N layers (backbone=10, all=24)")
    p.add_argument("--save-period", type=int, default=-1,
                   help="save epoch{N}.npz every N epochs (<1 disables)")
    p.add_argument("--sync-bn", action="store_true",
                   help="accepted for parity; BN is ALWAYS cross-replica here "
                        "(global-batch moments under pjit)")
    p.add_argument("--image-weights", action="store_true", help="class-mAP weighted image sampling")
    p.add_argument("--accumulate", type=int, default=0,
                   help="grad-accumulation factor (0 = auto round(64/bs), ref train.py:189)")
    p.add_argument("--no-accum-ramp", action="store_true",
                   help="disable the reference's warmup accumulate ramp "
                        "1->64/bs (ref train.py:412) and keep a fixed "
                        "cadence (one XLA train program)")
    return p


def get_latest_run(search_dir: str = "runs/train"):
    """Most recent last.npz under search_dir.  ref: general.py:128-131."""
    from pathlib import Path

    runs = sorted(Path(search_dir).rglob("last.npz"),
                  key=lambda p: p.stat().st_mtime)
    return runs[-1] if runs else None


def resolve_remat(remat: bool, no_remat: bool, imgsz: int) -> bool:
    """Remat policy: explicit flag wins; otherwise auto-on at >= 1024px.

    At high resolution the non-remat backward's activation live-set
    degrades XLA's schedule as well as capacity — remat there is strictly
    better (1536px bs4: 435 -> 369 ms/step, and bs8 fits where bs16 cannot
    compile). At 640px remat costs ~20% step time, so it stays off.
    """
    if remat:
        return True
    if no_remat:
        return False
    return imgsz >= 1024


def main(argv=None):
    opt = build_parser().parse_args(argv)
    if not opt.resume and not (opt.cfg and opt.data):
        build_parser().error("--cfg and --data are required unless --resume")
    from .common import setup_device

    setup_device(opt.device)
    import yaml as _yaml
    from pathlib import Path

    from ..train.trainer import Trainer

    # resolve BEFORE the opt.yaml dump below so the persisted run config
    # records the remat actually used (resume re-derives from the saved opt)
    if resolve_remat(opt.remat, opt.no_remat, opt.imgsz) and not opt.remat:
        opt.remat = True
        print(f"imgsz {opt.imgsz} >= 1024: enabling --remat "
              "(faster + smaller at high res; --no-remat to opt out)")

    if opt.resume:
        # restore the interrupted run's own options + dir (ref train.py:657-669)
        last = (get_latest_run(opt.project) if opt.resume == "auto"
                else Path(opt.resume))
        assert last is not None and last.exists(), \
            f"--resume: no checkpoint found ({opt.resume})"
        out = last.parent
        opt_file = out / "opt.yaml"
        if opt_file.exists():
            with open(opt_file, errors="ignore") as f:
                saved = _yaml.safe_load(f)
            keep = {"resume", "device"}  # current invocation wins for these
            for k, v in saved.items():
                if k not in keep and hasattr(opt, k):
                    setattr(opt, k, v)
        opt.resume = str(last)
        hyp_file = out / "hyp.yaml"
        hyp = (load_hyp(str(hyp_file)) if hyp_file.exists()
               else load_hyp(opt.hyp))
        print(f"resuming {last} (options restored from {opt_file})")
    else:
        out = increment_path(f"{opt.project}/{opt.name}", exist_ok=opt.exist_ok)
        hyp = load_hyp(opt.hyp)
        # persist run config for resume/audit (ref train.py:92-99)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "hyp.yaml", "w") as f:
            _yaml.safe_dump(dict(hyp), f, sort_keys=False)
        with open(out / "opt.yaml", "w") as f:
            _yaml.safe_dump(
                {k: v for k, v in vars(opt).items() if k != "device"}, f,
                sort_keys=False)

    if opt.batch_size == -1:  # HBM-aware batch search (ref utils/autobatch.py:47)
        import jax
        import jax.numpy as jnp

        from ..data.datasets import check_dataset
        from ..graph import DetectionModel
        from ..train.autobatch import find_train_batch_size

        data = check_dataset(opt.data)
        model = DetectionModel(resolve_config(opt.cfg, "models"), nc=data["nc"])
        if opt.assignment == "tal":
            from ..train.tal import ComputeLossTAL

            loss = ComputeLossTAL(model.stride, nc=data["nc"], hyp=dict(hyp))
        else:
            from ..train.loss import ComputeLoss

            loss = ComputeLoss(model.head.anchors, dict(hyp), nc=data["nc"])
        h = dict(hyp)
        opt.batch_size = find_train_batch_size(
            model, loss, h, img_size=opt.imgsz,
            dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
            max_targets=opt.max_targets,
            multiple_of=max(jax.local_device_count(), 1),
            remat=getattr(opt, "remat", False),
            # mirror the Trainer's deployed program: accumulate cadence and
            # uint8 inputs under --device-aug change the argument footprint
            device_aug=(
                {"hgain": h.get("hsv_h", 0.015), "sgain": h.get("hsv_s", 0.7),
                 "vgain": h.get("hsv_v", 0.4), "fliplr": h.get("fliplr", 0.5)}
                if getattr(opt, "device_aug", False) else None),
            accumulate=int(opt.accumulate) if getattr(opt, "accumulate", 0) else None,
        )

    if opt.evolve:
        from ..train.evolve import evolve

        def train_once(h):
            t = _make_trainer(opt, h, str(out / "evolve_run"))
            return t.train()

        best = evolve(train_once, hyp, generations=opt.evolve, out_dir=str(out),
                      autoanchor=not opt.noautoanchor)
        print("evolved hyp:", best)
        # ref train.py:817: plot_evolve(evolve_csv) after the GA finishes
        try:
            from ..utils.plots import plot_evolve

            png = plot_evolve(out / "evolve.csv")
            print(f"evolve plot -> {png}")
        except Exception as e:  # plotting must never fail the run
            print(f"plot_evolve failed: {type(e).__name__}: {e}")
        return best

    trainer = _make_trainer(opt, hyp, str(out))
    print(f"training -> {out}")
    return trainer.train()


def _make_trainer(opt, hyp, out_dir):
    import jax.numpy as jnp

    from ..train.trainer import Trainer

    hyp = dict(hyp)
    if getattr(opt, "label_smoothing", 0.0):
        hyp["label_smoothing"] = opt.label_smoothing  # ref train.py:333
    return Trainer(
        resolve_config(opt.cfg, "models"),
        opt.data,
        dict(hyp),
        epochs=opt.epochs,
        batch_size=opt.batch_size,
        img_size=opt.imgsz,
        assignment=opt.assignment,
        adam=opt.adam,
        linear_lr=opt.linear_lr,
        workers=opt.workers,
        out_dir=out_dir,
        max_targets=opt.max_targets,
        dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        spatial=opt.spatial_shard,
        seed=opt.seed,
        patience=opt.patience,
        train_ungrouped=opt.train_ungrouped,
        autoanchor=not opt.noautoanchor,
        multi_scale=opt.multi_scale,
        image_weights=opt.image_weights,
        single_cls=opt.single_cls,
        cache_images=opt.cache,
        resume_from=opt.resume if opt.resume and opt.resume != "auto" else None,
        pretrained=opt.weights or None,
        accumulate=opt.accumulate or None,
        accum_ramp=not getattr(opt, "no_accum_ramp", False),
        ckpt_async=opt.ckpt_async,
        device_aug=opt.device_aug,
        fastload=opt.fastload,
        rect=getattr(opt, "rect", False),
        quad=getattr(opt, "quad", False),
        nosave=getattr(opt, "nosave", False),
        noval=getattr(opt, "noval", False),
        freeze=getattr(opt, "freeze", 0),
        save_period=getattr(opt, "save_period", -1),
        remat=getattr(opt, "remat", False),
    )


if __name__ == "__main__":
    main()
