"""Decompose the bench volume time: fused sliding-window volume graph vs
bare model forwards vs transfer costs (axon-tunnel-aware).

Prints device-time for (a) the full fused VolumePredictor graph on one
volume, (b) the equivalent bare batched forwards, and wall-times for the
H2D/D2H transfers — so pipeline-overhead work targets the real gap.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mlagg_unet_tpu.inference.sliding_window import VolumePredictor
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    tile_size = (256, 224)
    n_slices, H, W = 10, 320, 260
    model = MLLAUper(
        out_channels=4, embed_dim=96, patch_size=2, depths=(2, 2, 2, 2),
        num_heads=(2, 4, 8, 16), mlp_ratio=2, sr_ratio=(16, 8, 4, 2),
        drop_path_rate=0.1, deep_supervision=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *tile_size, 1), jnp.float32)
    params = jax.jit(
        lambda: model.init({"params": key, "dropout": key}, x0))()["params"]

    predictor = VolumePredictor(
        model.apply, params, tile_size, 4, (0, 1), None,
        compute_dtype=jnp.bfloat16, transfer_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    vol = rng.rand(1, n_slices, H, W).astype(np.float32)

    # warm + get the pending handle WITHOUT fetching
    p = predictor.predict_device(vol)
    out = predictor.finalize(p)
    print("logits shape:", out.shape, out.dtype)

    # (a) fused volume graph, device-resident repeat
    t0 = time.perf_counter()
    reps = 5
    ps = [predictor.predict_device(vol) for _ in range(reps)]
    for q in ps:
        jax.block_until_ready(q[0] if isinstance(q, tuple) else q)
    t_vol = (time.perf_counter() - t0) / reps
    print(f"volume dispatch+compute (incl H2D): {t_vol*1000:.1f} ms")

    # (b) bare forwards: 8 batches of 20 (4 mirror variants x tb=5)
    xb = jnp.zeros((20, *tile_size, 1), jnp.bfloat16)
    pb = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    jax.block_until_ready(fwd(pb, xb))
    t0 = time.perf_counter()
    outs = [fwd(pb, xb) for _ in range(8 * reps)]
    jax.block_until_ready(outs[-1])
    t_fwd = (time.perf_counter() - t0) / reps
    print(f"8x bare forward batch20: {t_fwd*1000:.1f} ms")

    # (c) transfers
    t0 = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(vol)
        jax.block_until_ready(d)
    t_h2d = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for q in ps[:reps]:
        np.asarray(predictor.finalize(q))
    t_d2h = (time.perf_counter() - t0) / reps
    print(f"H2D volume ({vol.nbytes/1e6:.1f} MB): {t_h2d*1000:.1f} ms   "
          f"D2H logits fetch+finalize: {t_d2h*1000:.1f} ms")
    print(f"graph overhead vs bare forwards: {(t_vol-t_fwd)*1000:.1f} ms")


if __name__ == "__main__":
    main()
