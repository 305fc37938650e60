"""Full-training parity: train the torch reference AND dmayolo_tpu on the
SAME offline dataset with the SAME recipe, end to end, and compare mAP.

This is parity link 5 (docs/PARITY.md): per-link golden tests and the
10-step trajectory parity test exist in tests/; this tool shows both
frameworks *converging to the same place* through their full drivers
(mosaic, autoanchor, warmup, one-cycle LR, EMA, epoch val, checkpointing).

Zero-egress env => the dataset is the synthetic shapes fixture (the
offline coco128 stand-in), 192 train / 48 val at 320px, trained at 256px,
yolov5n from scratch with the reference's own hyp.scratch.yaml.

Phases (run separately; the reference side is hours of CPU):
  gen         write the dataset to /tmp/shapes_parity/data
  ref [N]     train the reference in-process (CPU) via its own train.py
              main(); `ref resume` continues an interrupted run
  tpu [N]     train dmayolo_tpu via its own CLI (TPU if available)
  report      parse both results.csv, cross-eval the ref best.pt under OUR
              val CLI (val-protocol parity on genuinely trained weights),
              print JSON

Reference surfaces exercised: train.py:67-835 (driver), val.py:88-353
(epoch evaluator), utils/autoanchor.py, utils/datasets.py mosaic pipeline.
Measured results from the bundled run are recorded in docs/PARITY.md.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = "/tmp/shapes_parity"
DATA = f"{ROOT}/data"
YAML = f"{DATA}/shapes.yaml"
EPOCHS = 100  # the recorded docs/PARITY.md run: 100 epochs both sides
IMG = 256
BS = 16
NOVAL = False
VDA_OBJ_SCALE = 3.5  # tools/vda_calibrate.py sweep (bs8, full recipe): 1.0 -> 0.005 mAP@.5, 2.5 -> 0.056, 3.5 -> 0.090, 5.0 -> tracks BELOW 3.5 (cluster geometry doesn't scale, so bigger objects drown in overlap-occlusion) — 3.5 is the measured top of the difficulty frontier
VDA2_OBJ_SCALE = 5.0  # link 7b: with cluster_scale = 5.0/3.5 the overlap stays ~constant and the flagship lands mid-range (round-5 calibration)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def set_profile(name):
    """Switch the run constants between the two recorded benchmarks:

    shapes (default) — the saturated 48-image smoke set (PARITY links
    5/5b/5c); vda — the discriminating VisDrone-analog (link 7): 192
    train / 512 val at 512 px, 40-110 tiny objects per image, 40 epochs
    (sized so the torch reference finishes on this 1-core host).
    """
    global ROOT, DATA, YAML, EPOCHS, IMG, NOVAL, BS
    if name in ("vda", "vda2", "vda3"):
        # vda2 = the second difficulty point (link 7b): obj_scale 5.0 with
        # cluster geometry scaled by 5.0/3.5 so the extra pixels are not
        # paid back as overlap-occlusion — the flagship gets an operating
        # point with real dynamic range (round-4 verdict, Weak #2)
        ROOT = f"/tmp/{name}_parity"
        DATA = f"/tmp/{name}"
        YAML = f"{DATA}/visdrone_analog.yaml"
        EPOCHS = 40
        IMG = 512
        # batch 8, like the fork's own small-batch VisDrone recipes
        # (train.sh:1 uses 4): warmup interpolates over BATCH counters
        # with the shared 1000-iter floor (ref train.py:345), so at 12
        # batches/epoch a bs16 run finishes 40 epochs only 48% through
        # the LR ramp; bs8 doubles the counter. Measured (vda_calibrate,
        # obj_scale 2.5): bs16 0.031 mAP@.5, bs8 0.056 — same semantics
        # in BOTH frameworks, so parity is unaffected, the benchmark is
        # just ~2x more discriminating.
        BS = 8
        # the torch reference needs ~13 s/batch-16 at 512 px on this
        # 1-core host; epoch-val on 512 images would dominate, so the ref
        # runs use its own --noval flag (final-epoch val only,
        # ref train.py:441,516) and link 7 compares final checkpoints
        # cross-evaluated under one protocol (our val CLI, f32)
        NOVAL = True


def gen(n_train=192, n_val=48, img_size=320):
    sys.path.insert(0, REPO)
    if DATA.startswith("/tmp/vda"):
        from dmayolo_tpu.data.synthetic import generate_visdrone_analog

        # obj_scale calibrated by tools/vda_calibrate.py so the flagship
        # lands mid-range instead of pinning at 0 (at 1.0, 60% of boxes
        # are < 8 px — below the sensor floor at 512 px).  vda2 scales the
        # cluster geometry with the objects (see generate_visdrone_analog)
        # vda3 = the vda2 statistics with a 384-image train split: the
        # vda2-192 calibration measured the flagship still budget-bound at
        # 0.057 (120 optimizer steps, all inside the shared 1000-iter
        # warmup floor); doubling the split doubles steps AND data, and
        # warmup ends 52% through instead of after the run
        default_obj = (VDA2_OBJ_SCALE if DATA in ("/tmp/vda2", "/tmp/vda3")
                       else VDA_OBJ_SCALE)
        scale = float(os.environ.get("VDA_OBJ_SCALE", default_obj))
        cluster = float(os.environ.get(
            "VDA_CLUSTER_SCALE",
            scale / VDA_OBJ_SCALE if DATA in ("/tmp/vda2", "/tmp/vda3")
            else 1.0))
        # vda2 models a LOWER-ALTITUDE operating point: zooming in by
        # `cluster` makes objects bigger, spreads the clusters, AND shows
        # fewer objects per frame (ground density constant => count
        # scales by 1/cluster^2).  Measured overlap-at-IoU>.25: official
        # 0.286 -> vda2 0.160 — the flagship gets real dynamic range.
        kw = {}
        if cluster > 1.0:
            kw = dict(min_objects=max(4, round(40 / cluster**2)),
                      max_objects=max(8, round(110 / cluster**2)))
        n_tr = int(os.environ.get(
            "VDA_N_TRAIN", 384 if DATA == "/tmp/vda3" else 192))
        path = generate_visdrone_analog(DATA, n_train=n_tr, n_val=512,
                                        img_size=512, seed=11,
                                        obj_scale=scale,
                                        cluster_scale=cluster, **kw)
    else:
        from dmayolo_tpu.data.synthetic import generate

        path = generate(DATA, n_train=n_train, n_val=n_val,
                        img_size=img_size, seed=7)
    print("dataset:", path)


def _scaled_cfg(src, out_name):
    """Width/depth-scaled (n-cost) copy of a reference config so the
    full-train parity runs are tractable on this 1-core host."""
    import yaml

    with open(src, errors="ignore") as f:
        cfg = yaml.safe_load(f)
    cfg["depth_multiple"], cfg["width_multiple"] = 0.33, 0.25
    os.makedirs(ROOT, exist_ok=True)
    path = f"{ROOT}/{out_name}"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return path


def _tal_cfg():
    """Scaled copy of the reference's TDetect config (CASPD_ODRTA: C3CA +
    SPD backbone, P2..P5 anchor-free head) — reference train.sh:3 recipe."""
    return _scaled_cfg("/root/reference/models/CASPD_ODRTA.yaml",
                       "caspd_odrta_n.yaml")


def _flagship_cfg():
    """Scaled copy of the DMA flagship ablation (SCConv backbone + CA +
    SPPFCSPC, reference models/ablation-ca-scconv-sppfcspc.yaml) — the
    fork's own contribution modules under full training dynamics."""
    return _scaled_cfg("/root/reference/models/ablation-ca-scconv-sppfcspc.yaml",
                       "flagship_n.yaml")


def ref(epochs=None, resume=False, tal=False, flagship=False):
    epochs = EPOCHS if epochs is None else epochs  # EPOCHS is set by
    # set_profile AFTER import — a def-time default would pin the shapes
    # profile's 100 epochs regardless of profile
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_compat import setup_reference_imports

    assert setup_reference_imports()
    if flagship:
        # the flagship yaml names module `CA`, which the reference never
        # defines (SURVEY §2.2) — inject the alias so its parse_model works
        from ref_compat import patch_ca_alias

        patch_ca_alias()
    import numpy as np

    # the reference predates numpy 1.24's alias removal
    for alias, py in (("int", int), ("float", float), ("bool", bool),
                      ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, py)

    import torch

    # the reference predates torch 2.6's weights_only=True default
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load

    from PIL import ImageFont

    # Pillow >= 10 removed FreeTypeFont.getsize (used by the reference's
    # Annotator); emulate via getbbox
    if not hasattr(ImageFont.FreeTypeFont, "getsize"):
        def _getsize(self, text):
            left, top, right, bottom = self.getbbox(text)
            return right - left, bottom - top

        ImageFont.FreeTypeFont.getsize = _getsize

    import utils.general as G

    # zero-egress: the reference's env checks try git/pip
    G.check_git_status = lambda *a, **k: None
    G.check_requirements = lambda *a, **k: None

    # load by explicit path: a bare `import train` can collide with OUR
    # root train.py when something else (e.g. pytest) owns sys.path[0]
    import importlib.util

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            name, f"/root/reference/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref_val = _load("val")  # train.py's epoch evaluator — same collision class
    ref_train = _load("train")

    assert "reference" in ref_train.__file__, ref_train.__file__
    ref_train.check_git_status = lambda *a, **k: None
    ref_train.check_requirements = lambda *a, **k: None

    if tal:
        # The reference CANNOT evaluate TAL/TDetect models: val.py:220
        # iterates TDetect's (x, box, cls) train_out tuple expecting anchor
        # tensors, and its NMS consumes (B, N, 5+nc) obj-at-4 layout while
        # TDetect emits channels-first (B, 4+nc, A) with no objectness —
        # `train.sh:3` crashes at the first epoch-end val upstream. Train
        # the reference blind (its own loss/optimizer, no epoch val) and
        # evaluate BOTH frameworks' TAL checkpoints under OUR val CLI
        # (report phase), which decodes TDetect natively.
        def _noop_run(*a, **k):
            import numpy as _np

            nc = 3
            return (0.0,) * 7, _np.zeros(nc), (0.0, 0.0, 0.0)

        ref_val.run = _noop_run

    # REF_SEED: the reference hardcodes init_seeds(1+RANK) (train.py:119,
    # no --seed flag) — patch it so the reference's own seed/aug-stream
    # noise band is measurable (link 7: our 3-seed band vs its one run)
    seed_env = os.environ.get("REF_SEED")
    if seed_env is not None:
        _orig_seeds = ref_train.init_seeds
        ref_train.init_seeds = lambda *a, **k: _orig_seeds(int(seed_env))

    sfx = "_tal" if tal else "_flagship" if flagship else ""
    sfx += os.environ.get("REF_RUNS_SUFFIX", "")
    runs = f"{ROOT}/ref_runs{sfx}"
    if tal:
        cfg = _tal_cfg()
    elif flagship:
        cfg = _flagship_cfg()
    else:
        cfg = "/root/reference/models/yolov5n.yaml"
    if resume:
        # continue an interrupted run from its own last.pt + opt.yaml
        sys.argv = ["train.py", "--resume", f"{runs}/exp/weights/last.pt"]
    else:
        sys.argv = [
            "train.py", "--img", str(IMG), "--batch-size", str(BS),
            "--epochs", str(epochs), "--weights", "",
            "--cfg", cfg,
            "--hyp", "/root/reference/data/hyps/hyp.scratch.yaml",
            "--data", YAML, "--workers", "4",
            "--project", runs, "--name", "exp", "--exist-ok",
            "--device", "cpu",
        ]
        if tal:
            # anchor-free TDetect head + TaskAlignedAssigner loss
            # (reference train.py:360-363, train.sh:3)
            sys.argv += ["--assignment", "tal", "--noautoanchor"]
        if NOVAL:
            sys.argv += ["--noval"]
    opt = ref_train.parse_opt()
    ref_train.main(opt)


def tpu(epochs=None, device=None, resume=False, tal=False, flagship=False):
    epochs = EPOCHS if epochs is None else epochs  # see ref()
    sfx = "_tal" if tal else "_flagship" if flagship else ""
    runs = f"{ROOT}/tpu_runs{sfx}"
    if tal:
        cfg = _tal_cfg()
    elif flagship:
        cfg = _flagship_cfg()
    else:
        cfg = "yolov5n.yaml"
    if resume:
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "--resume", f"{runs}/exp/last.npz"]
    else:
        cmd = [
            sys.executable, os.path.join(REPO, "train.py"),
            "--cfg", cfg,
            "--data", YAML, "--hyp", "scratch",
            "--img", str(IMG), "--batch-size", str(BS), "--epochs", str(epochs),
            "--workers", "4", "--project", runs, "--name", "exp",
            "--exist-ok", "--seed", "0",
        ]
        if tal:
            cmd += ["--assignment", "tal", "--noautoanchor"]
        if NOVAL:
            # crowded vda mosaics carry up to ~450 labels; 512 keeps every
            # one (the torch reference's variable-length collate never drops)
            cmd += ["--max-targets", "512"]
        if device:
            cmd += ["--device", device]
    subprocess.run(cmd, check=True)


def _csv_rows(path):
    import csv

    with open(path) as f:
        rows = [{k.strip(): v for k, v in row.items()}
                for row in csv.DictReader(f)]
    # an interrupted+resumed run can append duplicate epoch rows; keep the
    # last occurrence per epoch (the longest-lived writer) in epoch order
    by_epoch = {}
    for r in rows:
        by_epoch[int(float(r["epoch"]))] = r
    return [by_epoch[e] for e in sorted(by_epoch)]


def report(tal=False, flagship=False):
    sfx = "_tal" if tal else "_flagship" if flagship else ""
    out = {}
    key = "metrics/mAP_0.5"
    if not tal:  # TAL: the reference trains blind (see ref()), no mAP CSV
        ref_rows = _csv_rows(f"{ROOT}/ref_runs{sfx}/exp/results.csv")
        ref_map50 = [float(r[key]) for r in ref_rows
                     if r.get(key) not in (None, "")]
        out["ref_final_map50"] = ref_map50[-1]
        out["ref_best_map50"] = max(ref_map50)
    tpu_rows = _csv_rows(f"{ROOT}/tpu_runs{sfx}/exp/results.csv")
    tpu_map50 = [float(r[key]) for r in tpu_rows
                 if r.get(key) not in (None, "")]
    out["tpu_final_map50"] = tpu_map50[-1]
    out["tpu_best_map50"] = max(tpu_map50)

    # cross-eval: the reference-trained checkpoint under OUR val CLI — the
    # val protocol itself must reproduce the reference's number on its
    # weights (TAL: last.pt — the reference cannot select best itself)
    ckpt = f"{ROOT}/ref_runs{sfx}/exp/weights/" + ("last.pt" if tal else "best.pt")
    out["cross_val_line"] = _cross_val(ckpt, f"{ROOT}/cross_val{sfx}")
    if NOVAL:
        # link-7 protocol: BOTH finals under our val CLI (one protocol),
        # since the ref trained with --noval (single final-epoch val)
        out["tpu_cross_val_line"] = _cross_val(
            f"{ROOT}/tpu_runs{sfx}/exp/last.npz", f"{ROOT}/cross_val{sfx}_tpu")
    print(json.dumps(out, indent=2))
    return out


def _cross_val(ckpt, project, device="cpu"):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "val.py"),
         "--weights", ckpt,
         "--data", YAML, "--img", str(IMG), "--batch-size", str(BS),
         "--device", device, "--fp32",
         "--project", project, "--name", "exp", "--exist-ok"],
        capture_output=True, text=True)
    print(r.stdout[-2000:], file=sys.stderr)
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"cross-eval val.py failed (rc={r.returncode})")
    for line in r.stdout.splitlines():
        if "mAP@.5=" in line:
            return line.strip()


if __name__ == "__main__":
    args = sys.argv[1:]
    for prof in ("vda", "vda2", "vda3"):
        if prof in args:
            set_profile(prof)
            args = [a for a in args if a != prof]
    phase = args[0] if args else "gen"
    kw = {}
    if "tal" in args[1:] and phase in ("ref", "tpu", "report"):
        kw["tal"] = True
        args = [a for a in args if a != "tal"]
    if "flagship" in args[1:] and phase in ("ref", "tpu", "report"):
        kw["flagship"] = True
        args = [a for a in args if a != "flagship"]
    if len(args) > 1 and phase in ("ref", "tpu"):
        if args[1] == "resume":
            kw["resume"] = True
        else:
            kw["epochs"] = int(args[1])
    globals()[phase](**kw)
