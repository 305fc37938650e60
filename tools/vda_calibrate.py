"""Calibrate the VisDrone-analog difficulty (PARITY link 7 prerequisite).

The link-7 benchmark must land the flagship mid-range (0.3-0.6 mAP@.5)
so framework divergence is visible — round-3 verdict Weak #2.  At
obj_scale=1.0 (median sqrt-area 6.4 px at 512 px, 60% of boxes < 8 px)
the 40-epoch flagship run pins at ~0.00: most objects are below the
sensor floor, so the benchmark measures pixel physics, not training
dynamics.  This probe trains the SAME recipe as the official run
(scaled flagship cfg, hyp.scratch, bs16@512, 40 epochs, the shared
1000-iter warmup floor of ref train.py:345) at several obj_scale values
in ONE process (TPU acquisition over the axon tunnel costs ~10 min per
process) and prints one JSON line per scale; the chosen scale is then
baked into tools/fulltrain_parity.py's vda profile.

    python tools/vda_calibrate.py 1.75 2.5 3.5
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    scales = [float(a) for a in sys.argv[1:]] or [1.75, 2.5, 3.5]
    epochs = int(os.environ.get("VDA_CAL_EPOCHS", "40"))
    bs = int(os.environ.get("VDA_CAL_BS", "16"))

    from dmayolo_tpu.cli.common import enable_compilation_cache, load_hyp
    from dmayolo_tpu.data.synthetic import generate_visdrone_analog
    from dmayolo_tpu.train.trainer import Trainer

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from fulltrain_parity import set_profile, _flagship_cfg

    set_profile("vda")  # _flagship_cfg writes into the vda ROOT
    enable_compilation_cache("~/.cache/dmayolo_vda_cal")
    cfg = _flagship_cfg()
    hyp = load_hyp("scratch")

    for scale in scales:
        root = f"/tmp/vda_cal/s{scale:g}"
        yaml = f"{root}/visdrone_analog.yaml"
        if not os.path.exists(yaml):
            # smaller val than the official 512 — this probe only needs
            # the mAP@.5 magnitude, not tie-break-stable comparisons
            generate_visdrone_analog(root, n_train=192, n_val=96,
                                     img_size=512, seed=11,
                                     obj_scale=scale)
        t0 = time.time()
        out_dir = f"{root}/exp_bs{bs}"
        trainer = Trainer(
            cfg, yaml, dict(hyp), epochs=epochs, batch_size=bs,
            img_size=512, out_dir=out_dir, workers=4,
            max_targets=512, val_interval=5, seed=0, patience=0,
            autoanchor=True,  # the official CLI run re-clusters anchors
        )
        trainer.train(log_every=100)
        row = {
            "obj_scale": scale,
            "epochs": epochs,
            "bs": bs,
            "minutes": round((time.time() - t0) / 60, 1),
        }
        # read the authoritative numbers back from results.csv
        import csv

        with open(f"{out_dir}/results.csv") as f:
            rows = list(csv.DictReader(f))
        if rows:
            last = {k.strip(): v for k, v in rows[-1].items()
                    if k is not None}
            row["map50"] = float(last["metrics/mAP_0.5"])
            row["map"] = float(last["metrics/mAP_0.5:0.95"])
            row["recall"] = float(last["metrics/recall"])
        print("CAL " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
