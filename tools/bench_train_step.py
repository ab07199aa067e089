"""Measure the flagship train step (fwd+bwd+adamw) on the real TPU at the
reference recipe shapes (2d_bs10 plan: batch 10, patch 256x224)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools.tpu_time import device_time_ms
from mlagg_unet_tpu.models.mlla_uper import MLLAUper
from mlagg_unet_tpu.training import losses


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    model = MLLAUper(out_channels=4, deep_supervision=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, 256, 224, 1), jnp.float32)
    tgt = jnp.zeros((batch, 256, 224), jnp.int32)
    params = jax.jit(
        lambda: model.init({"params": key, "dropout": key}, x[:1])
    )()["params"]

    opt = optax.chain(optax.clip_by_global_norm(12.0),
                      optax.adamw(5e-4, eps=1e-4, weight_decay=3e-5))
    opt_state = jax.jit(opt.init)(params)

    ds_scales = [[1, 1], [0.5, 0.5], [0.25, 0.25], [0.125, 0.125],
                 [0.0625, 0.0625]]
    ds_weights = losses.deep_supervision_weights(5)

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, tree)

    def train_step(params, opt_state, data, target, rng):
        def loss_fn(p):
            outs = model.apply({"params": cast(p)}, cast(data), False,
                               rngs={"dropout": rng})
            targets = losses.downsample_seg_for_ds(target, ds_scales)
            return losses.deep_supervision_loss(
                lambda o, t: losses.dc_and_ce_loss(o, t, batch_dice=False,
                                                   do_bg=False),
                outs, targets, ds_weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step)  # no donation: the timing loop reuses inputs
    rng = jax.random.PRNGKey(1)

    _, _, loss = step(params, opt_state, x, tgt, rng)
    jax.block_until_ready(loss)
    print("compiled; loss =", float(loss))

    ms, top = device_time_ms(
        lambda p, o: step(p, o, x, tgt, rng)[2], params, opt_state,
        iters=3, top_k=15)
    print(f"train step batch={batch}: {ms:.1f} ms/iter")
    for n, t in top:
        print(f"  {t:8.2f} ms  {n}")


if __name__ == "__main__":
    main()
