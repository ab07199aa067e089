"""Micro-bench the Pallas selective scan at bench MSMM shapes on TPU."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.tpu_time import device_time_ms
import importlib
ssp = importlib.import_module("mlagg_unet_tpu.ops.selective_scan_pallas")


def main():
    b, g, d, L, n = 20, 4, 48, 4760, 16
    if len(sys.argv) > 1:
        b, g, d, L, n = map(int, sys.argv[1].split(","))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dt_in = jnp.bfloat16
    u = jax.random.normal(ks[0], (b, g, d, L), dt_in)
    delta = jax.random.normal(ks[1], (b, g, d, L), dt_in) * 0.1
    A = -jnp.exp(jax.random.normal(ks[2], (g, d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (b, g, n, L), dt_in)
    C = jax.random.normal(ks[4], (b, g, n, L), dt_in)
    D = jnp.ones((g, d), jnp.float32)
    bias = jax.random.normal(ks[5], (g, d), jnp.float32) * 0.1

    print(f"shapes b={b} g={g} d={d} L={L} n={n}  dtype={dt_in.__name__}")
    for gb_force in (None,):
        for lc in (128, 256, 512):
            fn = jax.jit(lambda u, dl, B, C, lc=lc: ssp.selective_scan_pallas(
                u, dl, A, B, C, D, bias, True, lc))
            try:
                ms, top = device_time_ms(fn, u, delta, B, C, iters=5, top_k=3)
            except Exception as e:
                print(f"  lc={lc}: FAIL {type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"  lc={lc}: {ms:6.1f} ms  top: "
                  + "  ".join(f"{nm}={t:.1f}" for nm, t in top))


if __name__ == "__main__":
    main()
