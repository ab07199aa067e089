"""Device-trace profiling utilities (the reference has no profiler at all;
SURVEY.md §5 calls for jax.profiler traces + per-stage timing in the TPU
build).

Why trace-based: wall-clock timing through a remote-device transport is
unreliable as a barrier; the device trace's "XLA Ops" events are ground
truth. These helpers run a function under ``jax.profiler``, parse the
trace, and aggregate op durations — flat (top-k ops) or grouped by the
flax module scope recorded in HLO metadata.

Used by tools/profile_bench.py, tools/profile_scopes.py and
tools/bench_train_step.py; importable for ad-hoc use:

    from mlagg_unet_tpu.utils.profiling import device_time_ms
    ms, top = device_time_ms(jitted_fn, *args, iters=3)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from typing import Optional


def _iter_device_ops(trace_dir):
    """Yields (op_name, duration_us) for ops on TPU 'XLA Ops' threads, plus
    a total over 'XLA Modules'."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                     recursive=True)
    pnames, tnames = {}, {}
    module_total = 0.0
    ops = []
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
                ops.append((ev["name"], ev["dur"]))
    return module_total, ops


def _trace(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return tmp


def device_time_ms(fn, *args, iters: int = 3, top_k: int = 10):
    """Run fn(*args) iters times under the profiler; return
    (total_device_ms_per_iter, [(op_name, ms_per_iter)] top_k)."""
    tmp = _trace(fn, args, iters)
    try:
        module_total, ops = _iter_device_ops(tmp)
        by_name = collections.Counter()
        for name, dur in ops:
            by_name[name] += dur
        top = [(n, d / 1000.0 / iters) for n, d in by_name.most_common(top_k)]
        return module_total / 1000.0 / iters, top
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_META = re.compile(r"%(\S+?) = .*metadata=\{op_name=\"([^\"]*)\"")


def device_time_by_scope(fn, *args, hlo_text: Optional[str] = None,
                         iters: int = 3, depth: int = 3, top_k: int = 30):
    """Aggregate device op time by flax module scope (from HLO metadata).
    hlo_text defaults to fn's compiled HLO when fn is a jitted function.
    Returns (total_ms_per_iter, [(scope, ms)], [(unmatched_op, ms)])."""
    if hlo_text is None:
        hlo_text = fn.lower(*args).compile().as_text()
    name_to_scope = {}
    for line in hlo_text.splitlines():
        m = _META.search(line)
        if m:
            name_to_scope[m.group(1)] = m.group(2)

    tmp = _trace(fn, args, iters)
    try:
        _, ops = _iter_device_ops(tmp)
        by_scope = collections.Counter()
        unmatched = collections.Counter()
        total = 0.0
        for name, dur in ops:
            total += dur
            scope = name_to_scope.get(name)
            if scope is None:
                unmatched[name] += dur
                continue
            parts = [p for p in scope.split("/")
                     if not p.startswith("jit(")][:depth]
            by_scope["/".join(parts)] += dur
        rows = [(s, d / 1000.0 / iters) for s, d in by_scope.most_common(top_k)]
        un = [(s, d / 1000.0 / iters) for s, d in unmatched.most_common(10)]
        return total / 1000.0 / iters, rows, un
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
