"""Aggregate device-trace op times by flax module scope.

Joins the XLA-op trace events with the compiled HLO's op_name metadata to
answer "which part of the model costs what" instead of staring at
fusion.NNNN names.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def trace_and_aggregate(fn, args, hlo_text: str, iters: int = 3,
                        depth: int = 3, top_k: int = 30):
    import jax

    # map HLO op name -> metadata op_name (the jax scope path)
    name_to_scope = {}
    pat = re.compile(r"%(\S+?) = .*metadata=\{op_name=\"([^\"]*)\"")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            name_to_scope[m.group(1)] = m.group(2)

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

        files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                          recursive=True)
        pnames, tnames = {}, {}
        by_scope = collections.Counter()
        unmatched = collections.Counter()
        total = 0.0
        for f in files:
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            for ev in data["traceEvents"]:
                if ev.get("ph") == "M" and ev.get("name") == "process_name":
                    pnames[ev["pid"]] = ev["args"]["name"]
                if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                    tnames[(ev["pid"], ev.get("tid"))] = ev["args"]["name"]
            for ev in data["traceEvents"]:
                if ev.get("ph") != "X" or "dur" not in ev:
                    continue
                if "TPU" not in pnames.get(ev["pid"], ""):
                    continue
                if tnames.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
                    continue
                name = ev["name"]
                dur = ev["dur"]
                total += dur
                scope = name_to_scope.get(name)
                if scope is None:
                    unmatched[name] += dur
                    continue
                # scope like jit(..)/MLLAUper/mlla/layer1/block0/attn_pool/..
                parts = [p for p in scope.split("/")
                         if not p.startswith("jit(")][:depth]
                by_scope["/".join(parts)] += dur
        rows = [(s, d / 1000.0 / iters) for s, d in by_scope.most_common(top_k)]
        un = [(s, d / 1000.0 / iters) for s, d in unmatched.most_common(10)]
        return total / 1000.0 / iters, rows, un
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    import jax
    import jax.numpy as jnp
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    model = MLLAUper(out_channels=4, deep_supervision=True)
    x = jnp.zeros((batch, 256, 224, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    hlo = fwd.lower(params, x).compile().as_text()

    total, rows, unmatched = trace_and_aggregate(
        fwd, (params, x), hlo, depth=depth, top_k=top_k)
    print(f"total XLA-op time: {total:.1f} ms/iter")
    for s, t in rows:
        print(f"  {t:8.2f} ms  {s}")
    if unmatched:
        print("unmatched:")
        for s, t in unmatched:
            print(f"  {t:8.2f} ms  {s}")


if __name__ == "__main__":
    main()
