"""Plotting: PR/F1 curves, confusion matrix, label stats, results curves,
training mosaics, feature maps.

ref: utils/plots.py (Annotator/plot_images/plot_results/feature_visualization)
and utils/metrics.py:313-352 (curve plots).  matplotlib Agg, host-side.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_pr_curve(px, py, ap, save_path, names=()):
    """ref: utils/metrics.py:313-330."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if isinstance(py, list) else py
    if 0 < len(names) < 21:
        for i in range(py.shape[1]):
            ax.plot(px, py[:, i], linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    ax.plot(px, py.mean(1), linewidth=3, color="blue",
            label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)


def plot_mc_curve(px, py, save_path, names=(), xlabel="Confidence", ylabel="Metric"):
    """ref: utils/metrics.py:333-352."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i in range(py.shape[0]):
            ax.plot(px, py[i], linewidth=1, label=str(names[i]))
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)


def plot_confusion_matrix(matrix, nc, names=(), save_path="confusion_matrix.png",
                          normalize=True):
    """ref: utils/metrics.py:160-189 (seaborn replaced with imshow)."""
    array = matrix / ((matrix.sum(0).reshape(1, -1) + 1e-9) if normalize else 1)
    array = np.where(array < 0.005, np.nan, array)
    fig, ax = plt.subplots(figsize=(12, 9), tight_layout=True)
    im = ax.imshow(array, cmap="Blues", vmin=0.0)
    fig.colorbar(im)
    labels = list(names) + ["background"] if 0 < len(names) < 99 else None
    n = nc + 1
    for i in range(n):
        for j in range(n):
            v = array[i, j]
            if np.isfinite(v):
                ax.text(j, i, f"{v:.2f}", ha="center", va="center",
                        color="white" if v > 0.5 else "black", fontsize=7)
    if labels:
        ax.set_xticks(range(n))
        ax.set_yticks(range(n))
        ax.set_xticklabels(labels, rotation=90, fontsize=8)
        ax.set_yticklabels(labels, fontsize=8)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)


def plot_labels(labels, names=(), save_dir=Path("")):
    """Label stats: class hist + box position/size scatter.
    ref: utils/plots.py:276-324 (pandas/seaborn replaced)."""
    c = labels[:, 0]
    b = labels[:, 1:5].T  # xywh normalised
    nc = int(c.max() + 1) if len(c) else 1
    fig, axs = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    axs[0, 0].hist(c, bins=np.linspace(0, nc, nc + 1) - 0.5, rwidth=0.8)
    axs[0, 0].set_ylabel("instances")
    if 0 < len(names) < 30:
        axs[0, 0].set_xticks(range(len(names)))
        axs[0, 0].set_xticklabels(names, rotation=90, fontsize=8)
    else:
        axs[0, 0].set_xlabel("classes")
    axs[0, 1].scatter(b[0], b[1], c=c, cmap="tab20", s=3, alpha=0.5)
    axs[0, 1].set_xlabel("x")
    axs[0, 1].set_ylabel("y")
    axs[1, 0].scatter(b[2], b[3], c=c, cmap="tab20", s=3, alpha=0.5)
    axs[1, 0].set_xlabel("width")
    axs[1, 0].set_ylabel("height")
    axs[1, 1].hist2d(b[2], b[3], bins=50, cmap="Blues")
    axs[1, 1].set_xlabel("width")
    axs[1, 1].set_ylabel("height")
    fig.savefig(Path(save_dir) / "labels.png", dpi=200)
    plt.close(fig)


def plot_results(csv_path, save_path=None):
    """Training curves from results.csv.  ref: utils/plots.py:356-378."""
    import csv as csvmod

    csv_path = Path(csv_path)
    with open(csv_path) as f:
        rows = list(csvmod.DictReader(f))
    if not rows:
        return
    keys = [k for k in rows[0] if k not in ("epoch",) and any(r.get(k) for r in rows)]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(n, 5)
    rows_n = -(-n // cols)
    fig, axs = plt.subplots(rows_n, cols, figsize=(3 * cols, 3 * rows_n), tight_layout=True)
    axs = np.atleast_1d(axs).ravel()
    for i, k in enumerate(keys):
        ys = [float(r[k]) if r.get(k) else np.nan for r in rows]
        axs[i].plot(epochs, ys, marker=".", linewidth=1, markersize=4)
        axs[i].set_title(k, fontsize=9)
    for j in range(len(keys), len(axs)):
        axs[j].axis("off")
    fig.savefig(save_path or csv_path.with_name("results.png"), dpi=200)
    plt.close(fig)


def plot_image_grid(images, targets_list=None, names=(), save_path="train_batch.png",
                    max_images=16):
    """Training-batch mosaic with boxes.  ref: utils/plots.py:151-228."""
    import cv2

    n = min(len(images), max_images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = -(-n // cols)
    h, w = images[0].shape[:2]
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        im = images[i].copy()
        if targets_list is not None and len(targets_list[i]):
            for cls, cx, cy, bw, bh in targets_list[i]:
                x1 = int((cx - bw / 2) * w)
                y1 = int((cy - bh / 2) * h)
                x2 = int((cx + bw / 2) * w)
                y2 = int((cy + bh / 2) * h)
                cv2.rectangle(im, (x1, y1), (x2, y2), (255, 60, 60), 2)
                label = names[int(cls)] if int(cls) < len(names) else str(int(cls))
                cv2.putText(im, str(label), (x1, max(y1 - 3, 8)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 60, 60), 1)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    cv2.imwrite(str(save_path), canvas[:, :, ::-1])


def feature_visualization(x, module_type: str, stage: int, n: int = 32,
                          save_dir=Path("runs/features")):
    """Dump per-stage feature-map PNGs (NHWC input).
    ref: utils/plots.py:423-447, hook in yolo.py:237-238."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    x = np.asarray(x)
    if x.ndim != 4:
        return
    _, h, w, c = x.shape
    if h <= 1 or w <= 1:
        return
    blocks = x[0].transpose(2, 0, 1)  # (C, H, W)
    n = min(n, c)
    cols = 8
    rows = -(-n // cols)
    fig, axs = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5), tight_layout=True)
    axs = np.atleast_1d(axs).ravel()
    for i in range(n):
        axs[i].imshow(blocks[i], cmap="viridis")
        axs[i].axis("off")
    for j in range(n, len(axs)):
        axs[j].axis("off")
    f = save_dir / f"stage{stage}_{module_type.replace('.', '_')}_features.png"
    fig.savefig(f, dpi=150)
    plt.close(fig)
    return f


def plot_evolve(evolve_csv, save_path=None):
    """Scatter each evolved hyperparameter against fitness, marking the best.

    Our evolve.csv schema is ["fitness", *hyp_keys] (train/evolve.py
    log_generation); the reference's has 7 metric columns before the hyps
    (ref: utils/plots.py:371-394, train.py:714-820).  Returns the png path.
    """
    import csv as _csv

    evolve_csv = Path(evolve_csv)
    with open(evolve_csv) as f:
        rows = list(_csv.reader(f))
    keys = [k.strip() for k in rows[0]]
    data = np.asarray([[float(v) for v in r] for r in rows[1:]], np.float64)
    fit = data[:, 0]
    j = int(np.argmax(fit))
    hyp_keys = keys[1:]
    cols = 5
    nrows = -(-len(hyp_keys) // cols)
    fig, axs = plt.subplots(nrows, cols, figsize=(10, 2 * nrows),
                            tight_layout=True)
    axs = np.atleast_1d(axs).ravel()
    for i, k in enumerate(hyp_keys):
        v = data[:, 1 + i]
        mu = v[j]
        axs[i].scatter(v, fit, c=fit, cmap="viridis", alpha=0.8,
                       edgecolors="none", s=12)
        axs[i].plot(mu, fit.max(), "k+", markersize=12)
        axs[i].set_title(f"{k} = {mu:.3g}", fontsize=8)
        axs[i].tick_params(labelsize=6)
        if i % cols != 0:
            axs[i].set_yticks([])
    for jx in range(len(hyp_keys), len(axs)):
        axs[jx].axis("off")
    f = Path(save_path) if save_path else evolve_csv.with_suffix(".png")
    fig.savefig(f, dpi=200)
    plt.close(fig)
    return f
