"""Profile the bench-path flagship forward on the real TPU chip.

Prints total device ms/iter and the top-k XLA ops so kernel tuning targets
the真 bottleneck (host wall-clock through the axon tunnel is unreliable).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_time import device_time_ms


def main():
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    tile = (256, 224)
    model = MLLAUper(out_channels=4, deep_supervision=False)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, *tile, 1), jnp.bfloat16)
    params = jax.jit(model.init)(rng, x)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"devices: {jax.devices()}  params: {n_params/1e6:.1f}M")

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    ms, top = device_time_ms(fwd, params, x, iters=3, top_k=25)
    print(f"forward batch={batch}: {ms:.1f} ms/iter")
    for name, t in top:
        print(f"  {t:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
