"""Fine-grained HLO byte census of the flagship forward (round-4 tool).

Complements census_traffic.py: instead of scope-aggregated totals it ranks
INDIVIDUAL ENTRY instructions by output bytes, tagging op kind + dtype, and
aggregates by op kind — so layout copies / f32 materializations / odd
fusions can be attributed precisely. TPU backend by default.

Usage: python tools/census_detail.py [batch]
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
NAME_RE = re.compile(r"^%?([\w.\-]+) = ")


def op_kind(rhs: str) -> str:
    m = re.match(r"[^ ]+ ([\w\-]+)\(", rhs)
    return m.group(1) if m else "?"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

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
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                          params)
    fn = jax.jit(lambda p, t: model.apply({"params": p}, t,
                                          deterministic=True))
    comp = fn.lower(params, x).compile()
    txt = comp.as_text()

    in_entry = False
    rows = []
    bykind = collections.Counter()
    bykind_n = collections.Counter()
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
        dts = set()
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            ob += n * DT[dt]
            dts.add(dt)
        kind = op_kind(rhs)
        bykind[kind] += ob
        bykind_n[kind] += 1
        if ob < 3e6:
            continue
        m = META_RE.search(s)
        scope = m.group(1) if m else "(no-meta)"
        scope = "/".join(p for p in scope.split("/")
                         if not p.startswith("jit("))[:80]
        nm = NAME_RE.match(s)
        shp = rhs.split("(")[0].strip()[:60]
        rows.append((ob, kind, ",".join(sorted(dts)), shp, scope,
                     nm.group(1) if nm else "?"))

    print("== total ENTRY output bytes by op kind ==")
    for k, v in bykind.most_common(15):
        print(f"  {v/1e9:7.2f} GB  x{bykind_n[k]:4d}  {k}")
    print("\n== top 60 individual outputs ==")
    rows.sort(reverse=True)
    for ob, kind, dts, shp, scope, nm in rows[:60]:
        print(f"  {ob/1e6:8.1f} MB  {kind:24s} {shp:44s} {scope}  [{nm}]")


if __name__ == "__main__":
    main()
