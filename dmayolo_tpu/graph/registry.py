"""Module registry for the YAML config system.

The reference resolves module names with `eval()` (ref: models/yolo.py:377)
— we use an explicit registry instead.  Includes the `CA` alias for
`CoorAttention`: 13 of the published configs reference `CA`, which is
undefined in the reference (SURVEY.md §2.2 "known defect") — the alias makes
those architectures loadable.
"""
from __future__ import annotations

from ..nn import blocks as B
from ..nn import heads as H
from ..nn.primitives import BatchNorm2d

# name in yaml -> module class
REGISTRY = {
    "Conv": B.ConvBN,
    "DWConv": B.DWConv,
    "Focus": B.Focus,
    "Bottleneck": B.Bottleneck,
    "BottleneckCSP": B.BottleneckCSP,
    "C3": B.C3,
    "C3TR": B.C3TR,
    "C3STR": B.C3STR,
    "C3SPP": B.C3SPP,
    "C3Ghost": B.C3Ghost,
    "SPP": B.SPP,
    "ASPP": B.ASPP,
    "SPPF": B.SPPF,
    "CBAM": B.CBAM,
    "TransformerBlock": B.TransformerBlock,
    "Contract": B.Contract,
    "Expand": B.Expand,
    "Concat": B.Concat,
    "GhostConv": B.GhostConv,
    "GhostBottleneck": B.GhostBottleneck,
    "AdaptADD": B.AdaptADD,
    "AdaptConcat": B.AdaptConcat,
    "AdConcat2": B.AdConcat2,
    "AdConcat3": B.AdConcat3,
    "Adapt_Add2": B.AdaptAdd2,
    "Adapt_Add3": B.AdaptAdd3,
    "ASFF": B.ASFF,
    "CoorAttention": B.CoorAttention,
    "CA": B.CoorAttention,  # alias — see module docstring
    "CABottleneck": B.CABottleneck,
    "C3CA": B.C3CA,
    "BAM": B.BAM,
    "SPPCSPC": B.SPPCSPC,
    "SPPFCSPC": B.SPPFCSPC,
    "SCConv": B.SCConv,
    "GnConv": B.GnConv,
    "HorBlock": B.HorBlock,
    "C3HB": B.C3HB,
    "C3GhostV2": B.C3GhostV2,
    "space_to_depth": B.SpaceToDepth,
    "SM": B.SM,
    "MP": B.MP,
    "SMMConv": B.SMMConv,
    "DMMConv": B.DMMConv,
    "DMMConv2": B.DMMConv2,
    "DMConv": B.DMConv,
    "DMMixConv2d": B.DMMixConv2d,
    "ConvMix": B.ConvMix,
    "CSPCM": B.CSPCM,
    "CrossConv": B.CrossConv,
    "Sum": B.Sum,
    "MixConv2d": B.MixConv2d,
    "Classify": B.Classify,
    "nn.Upsample": B.Upsample,
    "nn.BatchNorm2d": BatchNorm2d,
    "nn.MaxPool2d": B.MaxPool2d,
    "nn.ZeroPad2d": B.ZeroPad2d,
    "Detect": H.Detect,
    "TDetect": H.TDetect,
}

# groups mirroring parse_model's channel rules (ref: models/yolo.py:387-465)
WIDTH_GAIN = {
    "Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "SPPF", "DWConv",
    "MixConv2d", "Focus", "CrossConv", "BottleneckCSP", "C3", "C3TR", "C3STR",
    "C3SPP", "C3Ghost", "ASPP", "CBAM", "CoorAttention", "CA", "CABottleneck",
    "C3CA", "SPPCSPC", "SPPFCSPC", "SCConv", "HorBlock", "C3HB", "GnConv",
    # BAM is a verbatim duplicate of C3CA (ref common.py:1581-1587) but the
    # reference forgot it in the width list (yolo.py:388 has it only in the
    # insert-n list at :399), which is one of the two bugs breaking its
    # published CASMMsiou.yaml.  We treat it exactly like C3CA so the
    # repaired config (tools/repair_configs.py) is buildable.
    "BAM",
}
INSERT_N = {"BottleneckCSP", "C3", "C3TR", "C3STR", "C3Ghost", "C3CA", "C3HB", "BAM"}
