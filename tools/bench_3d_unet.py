"""3D sliding-window inference bench: 3d_fullres-topology PlainConvUNet
with full 8-way mirror TTA on the real chip.

The 2D flagship bench (bench.py) is the headline metric; this covers the
3D conv path (reference 3d_fullres configs, nnUNetTrainer defaults) and
exercises the tile-batch autotuner on a conv-dominated net — it picks a
different optimum there (model batch 16 vs the flagship's 8 on v5e,
2026-08-21: 0.713 vol/s for 96x192x192 volumes at patch 64x128x128).

Usage: python tools/bench_3d_unet.py [n_volumes]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_volumes = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from mlagg_unet_tpu.inference.sliding_window import VolumePredictor
    from mlagg_unet_tpu.models.dynamic_unet import PlainConvUNet

    tile = (64, 128, 128)
    model = PlainConvUNet(
        num_classes=3, n_stages=6,
        features_per_stage=[32, 64, 128, 256, 320, 320],
        conv_kernel_sizes=[[3, 3, 3]] * 6,
        pool_op_kernel_sizes=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2],
                              [2, 2, 2], [1, 2, 2]],
        n_conv_per_stage_encoder=[2] * 6, n_conv_per_stage_decoder=[2] * 5,
        deep_supervision=False)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *tile, 1), jnp.float32)
    params = jax.jit(lambda: model.init(key, x0))()["params"]

    predictor = VolumePredictor(
        lambda v, t: model.apply(v, t), params, tile, 3, (0, 1, 2), None,
        compute_dtype=jnp.bfloat16, transfer_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    vols = [rng.rand(1, 96, 192, 192).astype(np.float32)
            for _ in range(n_volumes)]
    predictor(vols[0])  # warmup: compiles + autotunes

    t0 = time.perf_counter()
    pending = [predictor.predict_device(v) for v in vols]
    outs = [predictor.finalize(p) for p in pending]
    elapsed = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in outs)
    print(json.dumps({
        "metric": "sliding_window_3d_volumes_per_sec_per_chip",
        "value": round(n_volumes / elapsed, 4),
        "unit": "volumes/s",
        "tuned_tile_batch": predictor._tb_tuned,
    }))


if __name__ == "__main__":
    main()
