"""Logger fan-out: CSV (always) + TensorBoard (if available).

ref: utils/loggers/__init__.py:34-156 — same 13 scalar keys so dashboards
carry over.  W&B is intentionally absent (the reference hard-disables it,
loggers/__init__.py:32).
"""
from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, Optional

KEYS = [
    "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss",
    "x/lr0", "x/lr1", "x/lr2",
]


class Loggers:
    def __init__(self, save_dir, use_tb: bool = True):
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.dir / "results.csv"
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.dir))
            except Exception:
                self.tb = None

    def log_metrics(self, metrics: Dict[str, float], step: int):
        row = {"epoch": step, **metrics}
        # Schema can widen mid-run (e.g. val_interval>1: the first epochs
        # log train keys only, val epochs add metrics/*) — keep one
        # consistent header by rewriting with the union of columns.
        fields = list(row.keys())
        old = None
        if self.csv_path.exists():
            with open(self.csv_path, newline="") as f:
                old = list(csv.DictReader(f).fieldnames or [])
            fields = old + [k for k in row if k not in old]
        if old is not None and fields == old:
            # header unchanged: plain append (crash-safe, no rewrite)
            with open(self.csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=fields, restval="").writerow(row)
        else:
            # header widens: rewrite atomically (temp file + os.replace) so
            # a crash mid-write cannot destroy the training history
            rows = []
            if old is not None:
                with open(self.csv_path, newline="") as f:
                    rows = list(csv.DictReader(f))
            rows.append(row)
            tmp = self.csv_path.with_suffix(".csv.tmp")
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fields, restval="")
                w.writeheader()
                w.writerows(rows)
            os.replace(tmp, self.csv_path)
        if self.tb:
            for k, v in metrics.items():
                try:
                    self.tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def log_image(self, name: str, img, step: int = 0):
        """img: HWC uint8 RGB numpy."""
        if self.tb is not None:
            self.tb.add_image(name, img, step, dataformats="HWC")

    def close(self):
        if self.tb:
            self.tb.flush()
            self.tb.close()

    def finalize(self):
        """End-of-training plots (results.png).  ref: on_train_end."""
        try:
            from .plots import plot_results

            if self.csv_path.exists():
                plot_results(self.csv_path)
        except Exception:
            pass
        self.close()
