"""Repair the 4 published-but-broken DMA-YOLO architecture configs.

The reference ships 4 model yamls that its OWN parse_model cannot build
(verified by running the torch reference in-process — see
tests/test_configs_build.py::test_reference_broken_configs_fail_identically):

  CASMM.yaml      RuntimeError: SMMConv declares c2 = 4*args[0]
                  (ref models/yolo.py:447-449) but the module actually
                  emits 4*c1 channels (ref models/common.py:1494-1507,
                  cat of two c1/2 convs -> space-to-depth); the author
                  passed the FOLLOWING C3's width instead of the incoming
                  width, so every declared channel count downstream is
                  wrong.  Repair: pass args[0] == incoming channels
                  (declared == actual); the C3 widths the author wanted
                  (128/256/512/1024) are untouched.
  CASMMsiou.yaml  same backbone defect, plus the head swaps C3CA for BAM
                  (a verbatim duplicate class, ref common.py:1581-1587)
                  which parse_model never channel-transforms (it is in the
                  insert-n list at yolo.py:399 but NOT the width list at
                  yolo.py:388) -> BAM(128, False) -> TypeError.  Repair:
                  backbone as CASMM; our parse treats BAM exactly like the
                  C3CA it duplicates (graph/registry.py WIDTH_GAIN).
  CMCA.yaml       three PAN-down skip indices copy-pasted from a config
                  with different layer numbering (CMCA inserts SPP rows,
                  shifting everything): 'cat head P3' reads layer 18 which
                  sits at /16, etc -> Concat spatial mismatch at the
                  stride probe.  Repair: point the three downsample
                  concats at the correct lateral convs / backbone taps
                  ([-1,22,6], [-1,18,9], [-1,14]) — the standard
                  YOLOv5-P2 PANet wiring (cf. models/C3CASPD.yaml).
  adaptadd.yaml   AdaptADD rows omit the out_ch argument (signature
                  level, out_ch, dimension, dim1.., ref common.py:916) ->
                  TypeError missing 'dim2'.  parse_model also declares
                  c2 = sum(input channels) (yolo.py:415-418), so the only
                  arg vector that is BOTH constructible and channel-
                  consistent is out_ch == sum(dims).  Repair: insert that
                  out_ch; the author's dimension/dim args are kept.

All repairs stay within the reference's parse_model semantics, so the
repaired yamls ALSO build in the torch reference (CASMMsiou excepted —
BAM is untransformable there) — which is what lets
tests/test_model_parity.py run true forward-parity on them.

Note: SMMConv's channel rule ignores width_multiple in the reference
(yolo.py:447-449 computes c2 from raw args), so CASMM/CASMMsiou are only
self-consistent at the published width 1.0 — same as upstream.

Run:  python tools/repair_configs.py
"""
from __future__ import annotations

import os

import yaml

REF = "/root/reference/models"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "dmayolo_tpu", "configs", "models")

HEADER = """\
# dmayolo_tpu model architecture config — REPAIRED variant of the
# reference's published {name}, which the reference itself cannot build
# (author bug; see tools/repair_configs.py for the defect + minimal fix,
# and tests/test_configs_build.py for the proof the original fails
# identically in both frameworks).  Regenerated data.
"""


def _load(name):
    with open(f"{REF}/{name}.yaml", errors="ignore") as f:
        return yaml.safe_load(f)


def _fix_smm_backbone(cfg):
    """SMMConv arg must equal incoming channels (declared == actual 4*c1)."""
    incoming = {1: 64, 3: 128, 5: 256, 7: 512}
    for i, row in enumerate(cfg["backbone"]):
        if row[2] == "SMMConv":
            row[3] = [incoming[i]]
    return cfg


def casmm():
    return _fix_smm_backbone(_load("CASMM"))


def casmmsiou():
    return _fix_smm_backbone(_load("CASMMsiou"))


def cmca():
    cfg = _load("CMCA")
    head = cfg["head"]
    # head rows are numbered after the 14-layer backbone (0..13)
    fixes = {
        15: [-1, 22, 6],   # cat head P3: lateral conv 22 (/8) + backbone C3 6
        20: [-1, 18, 9],   # cat head P4: lateral conv 18 (/16) + backbone C3 9
        25: [-1, 14],      # cat head P5: lateral conv 14 (/32)
    }
    for hi, frm in fixes.items():
        assert head[hi][2] == "Concat", (hi, head[hi])
        head[hi][0] = frm
    return cfg


def adaptadd():
    cfg = _load("adaptadd")
    ch = {2: 128, 4: 256, 6: 512, 10: 512, 14: 256, 18: 128}  # tap channels
    prev = {20: 128, 23: 128, 26: 256, 29: 512}  # ch[-1] per AdaptADD row
    for i, row in enumerate(cfg["head"], start=len(cfg["backbone"])):
        if row[2] != "AdaptADD":
            continue
        frm = row[0]
        dims = [prev[i]] + [ch[x] for x in frm[1:]]
        row[3] = [sum(dims), 1, *dims]  # out_ch == sum(ch) == declared c2
    return cfg


def main():
    for name, fn in [("CASMM", casmm), ("CASMMsiou", casmmsiou),
                     ("CMCA", cmca), ("adaptadd", adaptadd)]:
        cfg = fn()
        path = f"{OUT}/{name}.yaml"
        with open(path, "w") as f:
            f.write(HEADER.format(name=f"models/{name}.yaml"))
            yaml.safe_dump(cfg, f, sort_keys=False)
        print("wrote", path)


if __name__ == "__main__":
    main()
