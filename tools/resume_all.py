#!/usr/bin/env python
"""Resume every interrupted training under a runs root.

Environment-neutral redesign of the reference's AWS spot-recovery scanner
(utils/aws/resume.py:17-40): it rglobs `last.pt`, skips finished runs
(stripped optimizer), rebuilds the launch command from the run's saved
opt.yaml and re-execs — the same contract here, minus the cloud-specific
DDP port bookkeeping (a jitted pjit program needs no torchrun):

    python tools/resume_all.py [runs_root] [--dry-run]

A run is "interrupted" when its checkpoint still carries optimizer state
(strip_checkpoint removes it on completion, mirroring strip_optimizer)
and its saved epoch is short of opt.yaml's target.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def find_interrupted(root: Path):
    """Yield (last_ckpt, opt_dict) for unfinished runs under root."""
    import yaml

    sys.path.insert(0, str(REPO))
    from dmayolo_tpu.utils.checkpoint import load_checkpoint

    for last in sorted(root.rglob("last.npz")):
        opt_file = last.parent / "opt.yaml"
        if not opt_file.exists():
            continue
        try:
            trees, meta = load_checkpoint(last)
        except Exception as e:
            print(f"skip {last}: unreadable ({e})")
            continue
        if "opt_mom" not in trees:  # stripped == finished (ref resume.py:20-21)
            continue
        with open(opt_file, errors="ignore") as f:
            opt = yaml.safe_load(f)
        epochs = int(opt.get("epochs", 0))
        if meta.get("epoch", -1) + 1 >= epochs:
            continue
        yield last, opt


def main(argv=None):
    p = argparse.ArgumentParser("resume-all")
    p.add_argument("root", nargs="?", default="runs/train")
    p.add_argument("--dry-run", action="store_true",
                   help="print the commands without launching")
    p.add_argument("--parallel", action="store_true",
                   help="launch all resumes at once (multi-device hosts; "
                        "default is sequential — one chip serves one run)")
    args = p.parse_args(argv)

    procs, launched = [], 0
    for last, opt in find_interrupted(Path(args.root)):
        cmd = [sys.executable, str(REPO / "train.py"), "--resume", str(last)]
        print(" ".join(cmd))
        launched += 1
        if args.dry_run:
            continue
        pr = subprocess.Popen(cmd, cwd=REPO)
        if args.parallel:
            procs.append(pr)
        else:
            # sequential: the reference scanner pins each relaunch to its
            # own GPU (aws/resume.py:28-35); with one TPU chip the analog
            # is one run at a time
            rc = pr.wait()
            if rc != 0:
                print(f"resume of {last} exited rc={rc}")
    if not launched:
        print("no interrupted runs found")
    for pr in procs:
        pr.wait()


if __name__ == "__main__":
    main()
