"""Shared synthetic blob task for the training-dynamics convergence golden.

Both sides of the comparison use EXACTLY these batches, in this order:
* ``tools/gen_convergence_golden.py`` trains the reference torch flagship
  (tiny config) and records the final pseudo-dice band into
  ``tests/goldens/convergence_golden.json``.
* ``tests/test_convergence_golden.py`` trains our flagship trainer (same
  tiny net, torch-converted identical init, same LR/optimizer recipe) and
  asserts the final pseudo-dice lands inside the band.

The task: 2 foreground ellipse classes whose intensity is tied to the
class id plus Gaussian noise — learnable to high dice in ~100 steps, so
optimizer/LR-schedule/loss/bf16 drift shows up as a dice gap.
"""
from __future__ import annotations

import numpy as np

# one place for every hyperparameter both sides must share
CONFIG = {
    "size": (32, 32),
    "batch": 4,
    "n_classes": 3,
    "epochs": 30,
    "iters_per_epoch": 4,
    "val_batches": 2,
    "warmup_epochs": 5,
    "initial_lr": 5e-4,
    "weight_decay": 3e-5,
    "adam_eps": 1e-4,
    "grad_clip": 12.0,
    "batch_dice": True,
    "smooth": 1e-5,
    "seed_data": 777,
    "seed_init": 0,
    # tiny flagship build (same family/shape rules as the real one,
    # nnUNetTrainer_MLAgg_2D_dt_MS.py:62-92, scaled down)
    "embed_dim": 32,
    "depths": (1, 1, 1, 1),
    "num_heads": (2, 4, 8, 16),
    "mlp_ratio": 2,
    "sr_ratio": (16, 8, 4, 2),
    "drop_path": 0.0,
}

# flagship fixed 5-level DS scales (trainer :101-104)
DS_SCALES = [[1.0, 1.0], [0.5, 0.5], [0.25, 0.25], [0.125, 0.125],
             [0.0625, 0.0625]]
DS_WEIGHTS = [w / 1.9375 for w in (1.0, 0.5, 0.25, 0.125, 0.0625)]


def _blob_batch(rng: np.random.Generator, batch, size):
    H, W = size
    data = np.zeros((batch, H, W, 1), np.float32)
    seg = np.zeros((batch, H, W), np.int64)
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(batch):
        for cls in (1, 2):
            cy = rng.uniform(0.25, 0.75) * H
            cx = rng.uniform(0.25, 0.75) * W
            ry = rng.uniform(0.12, 0.28) * H
            rx = rng.uniform(0.12, 0.28) * W
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            seg[i][m] = cls
            data[i, :, :, 0][m] = cls * 0.8
        data[i, :, :, 0] += rng.normal(0.0, 0.3, (H, W)).astype(np.float32)
    return data, seg


def make_batches():
    """Returns (train_batches, val_batches); each element is
    (data (B,H,W,1) fp32 channels-last, seg (B,H,W) int)."""
    c = CONFIG
    rng = np.random.default_rng(c["seed_data"])
    train = [_blob_batch(rng, c["batch"], c["size"])
             for _ in range(c["epochs"] * c["iters_per_epoch"])]
    val = [_blob_batch(rng, c["batch"], c["size"])
           for _ in range(c["val_batches"])]
    return train, val


def lr_at_epoch(epoch: int) -> float:
    """Mirror of training/lr_schedule.cosine_warmup_lr (timm semantics,
    warmup_lr_init 1e-4, lr_min 1e-6) in plain python."""
    import math

    c = CONFIG
    initial, warmup = c["initial_lr"], c["warmup_epochs"]
    warmup_lr_init, lr_min, total = 1e-4, 1e-6, c["epochs"]
    if epoch < warmup:
        return warmup_lr_init + epoch * (initial - warmup_lr_init) / max(
            warmup, 1)
    t = min(max((epoch - warmup) / max(total - warmup, 1), 0.0), 1.0)
    return lr_min + 0.5 * (initial - lr_min) * (1 + math.cos(math.pi * t))


def pseudo_dice(tp, fp, fn):
    """Reference online pseudo-dice from accumulated per-class counts."""
    out = []
    for i, j, k in zip(tp, fp, fn):
        denom = 2 * i + j + k
        out.append(float(2 * i / denom) if denom > 0 else 0.0)
    return out
