"""Profiler-backed timing for TPU functions (the axon tunnel makes
block_until_ready unreliable as a wall-clock barrier; device trace events
are the ground truth).

Usage:
    from tools.tpu_time import device_time_ms
    ms, top = device_time_ms(fn, *args, iters=3)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile


def device_time_ms(fn, *args, iters: int = 3, top_k: int = 10):
    """Run fn(*args) iters times under jax.profiler; return
    (total_device_ms_per_iter, [(op_name, ms_per_iter)...top_k])."""
    import jax

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
        by_name = collections.Counter()
        module_total = 0.0
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
                pn = pnames.get(ev["pid"], "")
                tn = tnames.get((ev["pid"], ev.get("tid")), "")
                if "TPU" not in pn:
                    continue
                if tn == "XLA Modules":
                    module_total += ev["dur"]
                elif tn == "XLA Ops":
                    by_name[ev["name"]] += ev["dur"]
        top = [(n, d / 1000.0 / iters) for n, d in by_name.most_common(top_k)]
        return module_total / 1000.0 / iters, top
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
