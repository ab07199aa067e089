"""Training-loader throughput benchmark (VERDICT r1 item 7).

Measures augmenting-loader batches/sec on a synthetic ACDC-like 2D dataset
at the flagship config (patch 256x224, batch 10, full TrainingTransforms)
and compares against the train-step consumption rate (250 ms/step on the
v5e => 4 batches/s; the loader must sustain >= 2x that to never stall the
chip).

Usage: python tools/bench_loader.py [num_workers] [seconds]
Prints one JSON line: {"batches_per_sec": ..., "consumption_rate": 4.0,
"headroom": ...}.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_synthetic_dataset(root, n_cases=8, shape=(1, 12, 288, 260)):
    """npz cases shaped like preprocessed ACDC 2D-plan data."""
    import os

    from mlagg_unet_tpu.data.dataset import nnUNetDataset

    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    keys = []
    for i in range(n_cases):
        key = f"case_{i:03d}"
        data = rng.randn(*shape).astype(np.float32)
        seg = rng.randint(0, 4, (1,) + shape[1:]).astype(np.int8)
        np.savez(f"{root}/{key}.npz", data=data, seg=seg)
        # class locations pickle (fg sampling)
        import pickle

        locs = {}
        for c in range(1, 4):
            idx = np.argwhere(seg[0] == c)[:500]
            locs[c] = np.hstack([np.zeros((len(idx), 1), np.int64), idx])
        with open(f"{root}/{key}.pkl", "wb") as f:
            pickle.dump({"class_locations": locs,
                         "spacing": [10.0, 1.25, 1.25]}, f)
        keys.append(key)
    return nnUNetDataset(root, keys), keys


def main():
    num_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

    from mlagg_unet_tpu.data.augment import (
        TrainingTransforms,
        get_patch_size,
    )
    from mlagg_unet_tpu.data.loader import (
        PrefetchLoader,
        nnUNetDataLoader2D,
    )

    import numpy as _np

    patch_size = [256, 224]
    rotation = {"x": (-_np.pi, _np.pi), "y": (0, 0), "z": (0, 0)}
    initial_patch = get_patch_size(
        patch_size, rotation["x"], rotation["y"], rotation["z"],
        (0.85, 1.25))
    transforms = TrainingTransforms(
        list(patch_size), rotation, (0, 1), False, None,
        order_resampling_data=3, order_resampling_seg=1,
        is_cascaded=False, foreground_labels=(1, 2, 3),
    )

    with tempfile.TemporaryDirectory() as root:
        ds, keys = build_synthetic_dataset(root)
        # training always unpacks npz -> npy memmaps first
        # (trainer.py:653; reference nnUNetTrainer on_train_start)
        from mlagg_unet_tpu.data.dataset import unpack_dataset

        unpack_dataset(root, num_processes=2)

        def make_loader(worker_id):
            return nnUNetDataLoader2D(
                ds, 10, list(initial_patch), list(patch_size), 0.33,
                annotated_classes_key=(0, 1, 2, 3), has_ignore=False,
                transforms=transforms, seed=1000 + worker_id,
            )

        loader = PrefetchLoader(make_loader, num_workers=num_workers,
                                queue_size=6, num_batches_per_epoch=10 ** 9)
        # warmup: first batch per worker pays npz decompression
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
        "num_workers": num_workers,
        "batches_per_sec": round(bps, 2),
        "consumption_rate": 4.0,
        "headroom": round(bps / 4.0, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
