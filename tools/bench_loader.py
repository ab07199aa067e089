"""Training-loader throughput benchmark (VERDICT r1 item 7, r2 item 6).

Modes:
  2d        flagship ACDC-like config: patch 256x224, batch 10, full
            TrainingTransforms (the round-1 measurement: 10.3 b/s).
  3d        BTCV-like 3d_fullres: patch (96,160,160), batch 2, order-3
            isotropic spatial aug (rot ±30° every axis).
  3d_aniso  anisotropic spacing -> dummy-2D aug path (in-plane rotation
            on each slice pseudo-2D, reference get_training_transforms
            do_dummy_2d_data_aug branch).

The consumption rate to beat is the TPU train-step rate for that config
(2d: 4 steps/s measured on the v5e; 3d: pass the measured rate via
--consumption once known). The loader must sustain >= the consumption
rate with headroom or it stalls the chip.

Usage: python tools/bench_loader.py [num_workers] [seconds] [mode]
           [backend] [--consumption R]
backend: threads | processes (default: what the trainer would pick —
processes for 3d modes, threads for 2d).
Prints one JSON line with batches_per_sec + headroom.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_synthetic_dataset(root, n_cases=8, shape=(1, 12, 288, 260),
                            n_classes=4, spacing=(10.0, 1.25, 1.25)):
    """npz cases shaped like preprocessed data for the chosen config."""
    import os
    import pickle

    from mlagg_unet_tpu.data.dataset import nnUNetDataset

    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    keys = []
    for i in range(n_cases):
        key = f"case_{i:03d}"
        data = rng.randn(*shape).astype(np.float32)
        # blobby (anatomy-like) labels: voxel-noise segs would force the
        # seg interpolator's mixed-cell slow path at EVERY voxel, which no
        # real segmentation does
        blob = gaussian_filter(rng.randn(*shape[1:]).astype(np.float32), 6)
        qs = np.quantile(blob, np.linspace(0.3, 0.9, n_classes - 1))
        seg = np.digitize(blob, qs).astype(np.int8)[None]
        np.savez(f"{root}/{key}.npz", data=data, seg=seg)
        locs = {}
        for c in range(1, n_classes):
            idx = np.argwhere(seg[0] == c)[:500]
            locs[c] = np.hstack([np.zeros((len(idx), 1), np.int64), idx])
        with open(f"{root}/{key}.pkl", "wb") as f:
            pickle.dump({"class_locations": locs,
                         "spacing": list(spacing)}, f)
        keys.append(key)
    return nnUNetDataset(root, keys), keys


MODES = {
    # name: (case shape, patch, batch, rotation, dummy2d, spacing,
    #        default consumption rate steps/s)
    "2d": ((1, 12, 288, 260), [256, 224], 10,
           {"x": (-np.pi, np.pi), "y": (0, 0), "z": (0, 0)}, False,
           (10.0, 1.25, 1.25), 4.0),
    "3d": ((1, 120, 200, 200), [96, 160, 160], 2,
           {"x": (-np.pi / 6, np.pi / 6), "y": (-np.pi / 6, np.pi / 6),
            "z": (-np.pi / 6, np.pi / 6)}, False,
           (1.5, 1.0, 1.0), 1.0),
    "3d_aniso": ((1, 64, 240, 240), [48, 192, 192], 2,
                 {"x": (-np.pi, np.pi), "y": (0, 0), "z": (0, 0)}, True,
                 (5.0, 0.8, 0.8), 1.0),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_workers = int(args[0]) if len(args) > 0 else 12
    seconds = float(args[1]) if len(args) > 1 else 20.0
    mode = args[2] if len(args) > 2 else "2d"
    backend = args[3] if len(args) > 3 else (
        "threads" if mode == "2d" else "processes")
    consumption = None
    for a in sys.argv[1:]:
        if a.startswith("--consumption="):
            consumption = float(a.split("=")[1])

    case_shape, patch_size, batch_size, rotation, dummy2d, spacing, \
        default_rate = MODES[mode]
    if consumption is None:
        consumption = default_rate

    from mlagg_unet_tpu.data.augment import (
        TrainingTransforms,
        get_patch_size,
    )
    from mlagg_unet_tpu.data.loader import (
        PrefetchLoader,
        ProcessPrefetchLoader,
        nnUNetDataLoader2D,
        nnUNetDataLoader3D,
    )

    if dummy2d:
        # reference configure_rotation_dummyDA_...: inflate in-plane only
        initial_patch = get_patch_size(
            patch_size[1:], rotation["x"], rotation["y"], rotation["z"],
            (0.85, 1.25))
        initial_patch = [patch_size[0], *initial_patch]
    else:
        initial_patch = get_patch_size(
            patch_size, rotation["x"], rotation["y"], rotation["z"],
            (0.85, 1.25))
    transforms = TrainingTransforms(
        list(patch_size), rotation, (0, 1) if mode == "2d" else (0, 1, 2),
        dummy2d, None, order_resampling_data=3, order_resampling_seg=1,
        is_cascaded=False, foreground_labels=(1, 2, 3),
    )

    loader_cls = nnUNetDataLoader2D if mode == "2d" else nnUNetDataLoader3D

    with tempfile.TemporaryDirectory() as root:
        ds, keys = build_synthetic_dataset(root, shape=case_shape,
                                           spacing=spacing)
        # training always unpacks npz -> npy memmaps first
        # (trainer.py:653; reference nnUNetTrainer on_train_start)
        from mlagg_unet_tpu.data.dataset import unpack_dataset

        unpack_dataset(root, num_processes=2)

        def make_loader(worker_id):
            return loader_cls(
                ds, batch_size, list(initial_patch), list(patch_size), 0.33,
                annotated_classes_key=(0, 1, 2, 3), has_ignore=False,
                transforms=transforms, seed=1000 + worker_id,
            )

        pool_cls = ProcessPrefetchLoader if backend == "processes" \
            else PrefetchLoader
        loader = pool_cls(make_loader, num_workers=num_workers,
                          queue_size=6, num_batches_per_epoch=10 ** 9)
        # warmup: first batch per worker pays npy open + first aug compile
        for _ in range(num_workers):
            loader.get_batch()
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            loader.get_batch()
            n += 1
        dt = time.perf_counter() - t0
        loader.stop()

    bps = n / dt
    out = {
        "mode": mode,
        "backend": backend,
        "host_cpus": os.cpu_count(),
        "num_workers": num_workers,
        "patch_size": patch_size,
        "batch_size": batch_size,
        "batches_per_sec": round(bps, 2),
        "consumption_rate": consumption,
        "headroom": round(bps / consumption, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
