"""HBM-traffic census of the flagship forward (perf round tool).

Compiles the batch-20 tile forward (the sliding-window inner graph) and
reports XLA cost analysis plus a per-module-scope breakdown of large
ENTRY-computation outputs parsed from the optimized HLO. Run it on the
TPU backend to see the real fusion/layout decisions; on CPU it gives a
structural approximation (CPU fuses less, so byte counts are an upper
bound).

Findings so far (CPU HLO, batch 20, bf16 params+input, scan stubbed):
  * non-scan bytes accessed ~108-124 GB/forward — at the v5e's ~820 GB/s
    that alone is ~130-150 ms, matching the measured 155 ms forward:
    the flagship forward is HBM-BOUND IN THE GLUE, not compute-bound.
    Cutting bytes, not flops, is the path to >=1.5 vol/s.
  * large materialized tensors are ~entirely f32 even in the bf16
    forward: flax LayerNorm computes statistics in f32 and XLA fuses the
    upcast into the producing fusion, so block outputs materialize at 2x
    width. Candidate fixes, to be validated on real TPU HLO: fewer
    LN-induced fusion breaks (fused norm kernel), or keeping the
    residual stream bf16 by isolating the f32 stat computation.
  * hotspot ranking (outputs): mlla/layer0 blocks >> mambaskip
    self_attention (cross-scan concat layouts) > mlla/layer1 > decoder
    stage-0 convs. Matches the r2 trace profile (layer0 glue 15.6 ms).

Usage: python tools/census_traffic.py [batch] [--with-scan] [--cpu]
(--cpu forces the CPU backend BEFORE first dispatch — the axon
sitecustomize ignores JAX_PLATFORMS, and backend init hangs if the TPU
tunnel is down.)
"""
from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1, "u8": 1,
      "pred": 1, "f64": 8, "s64": 8, "u32": 4}
SHAPE_RE = re.compile(
    r"(f32|bf16|f16|f64|s32|s64|s8|u8|u32|pred)\[([0-9,]*)\]")
META_RE = re.compile(r'op_name="([^"]*)"')


def census(txt, min_bytes=5e6, depth=4):
    """Parse optimized HLO text -> (by_scope, counts, by_dtype) over the
    ENTRY computation's instruction outputs."""
    in_entry = False
    rows = collections.Counter()
    count = collections.Counter()
    bydt = collections.Counter()
    for line in txt.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        s = line.strip()
        if "= " not in s or "parameter(" in s:
            continue
        rhs = s.split("= ", 1)[1]
        shapes = SHAPE_RE.findall(rhs.split("(")[0])
        if not shapes:
            continue
        ob = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b = n * DT[dt]
            if b >= min_bytes:
                bydt[dt] += b
            ob += b
        if ob < min_bytes:
            continue
        m = META_RE.search(s)
        scope = m.group(1) if m else "(no-meta)"
        parts = [p for p in scope.split("/")
                 if not p.startswith("jit(")][:depth]
        rows["/".join(parts)] += ob
        count["/".join(parts)] += 1
    return rows, count, bydt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("--") else 20
    with_scan = "--with-scan" in sys.argv

    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    if not with_scan:
        # stub the scan: its Pallas kernel is VMEM-resident on TPU and the
        # CPU assoc-scan fallback would dominate the census with traffic
        # the production kernel never pays
        def stub(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                 delta_softplus=False, reverse=False, **kw):
            return u + 0 * delta

        import mlagg_unet_tpu.models.mamba_block as mbk
        import mlagg_unet_tpu.models.mamba_skip as msk

        msk.selective_scan = stub
        mbk.selective_scan = stub

    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    model = MLLAUper(
        out_channels=4, embed_dim=96, patch_size=2, depths=(2, 2, 2, 2),
        num_heads=(2, 4, 8, 16), mlp_ratio=2, sr_ratio=(16, 8, 4, 2),
        drop_path_rate=0.1, deep_supervision=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, 256, 224, 1), jnp.bfloat16)
    params = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 256, 224, 1), jnp.float32)))["params"]
    # production inference casts params to bf16 (sliding_window.py)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                          params)
    fn = jax.jit(lambda p, t: model.apply({"params": p}, t,
                                          deterministic=True))
    comp = fn.lower(params, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"backend={jax.default_backend()} batch={batch} "
          f"with_scan={with_scan}")
    print("flops: %.3f T   bytes accessed: %.2f GB"
          % (ca.get("flops", 0) / 1e12,
             ca.get("bytes accessed", 0) / 1e9))
    rows, count, bydt = census(comp.as_text())
    print("large ENTRY outputs by dtype:",
          {k: round(v / 1e9, 2) for k, v in bydt.items()}, "GB")
    for sc, b in rows.most_common(25):
        print(f"{b / 1e9:7.2f} GB  x{count[sc]:3d}  {sc}")


if __name__ == "__main__":
    main()
