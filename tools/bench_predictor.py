"""End-to-end predictor overlap benchmark (VERDICT r2 item 5).

Runs >= 8 synthetic ACDC-like raw volumes through the full
NNUNetPredictor.predict_from_files pipeline (read -> preprocess ->
sliding-window predict -> resample/export) and measures how idle the
chip is between volumes: the pipeline overlaps preprocessing (thread
pool), the 1-deep device dispatch queue, the async device->host logits
copy, and export workers (reference semantics:
predict_from_raw_data.py:211-254).

chip idle % = 1 - (device busy time from the jax.profiler trace /
wall time of the predict loop). Requires the real chip: on the 1-core
CPU runner even MLAGG_BENCH_TINY=1 (shrunken net + volumes) cannot push
a volume through the fused sliding-window graph in bounded time — the
predict path itself is covered by tests/test_posthoc.py and
tests/test_reference_ckpt_import.py, and the trace parsing by
tools/profile_bench.py.

Usage: python tools/bench_predictor.py [n_volumes] [n_folds]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_volumes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_folds = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax
    import jax.numpy as jnp

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.plans.plans_handler import PlansManager
    from mlagg_unet_tpu.utils.helpers import join, load_json
    from mlagg_unet_tpu.utils.profiling import _iter_device_ops
    from mlagg_unet_tpu.utils.synthetic_data import (
        generate_synthetic_dataset,
    )

    tile_size = (256, 224)

    with tempfile.TemporaryDirectory() as root:
        raw, pre = os.path.join(root, "raw"), os.path.join(root, "pre")
        os.makedirs(raw)
        os.makedirs(pre)
        paths.nnUNet_raw, paths.nnUNet_preprocessed = raw, pre
        tiny = os.environ.get("MLAGG_BENCH_TINY") == "1"
        generate_synthetic_dataset(raw, "Dataset995_PB",
                                   num_train=n_volumes, num_test=0,
                                   shape=(4, 280, 230) if tiny
                                   else (10, 320, 260), seed=0)
        DatasetFingerprintExtractor("Dataset995_PB", num_processes=1).run()
        ExperimentPlanner("Dataset995_PB").plan_experiment()
        plans = load_json(join(pre, "Dataset995_PB", "nnUNetPlans.json"))
        plans["configurations"]["2d"]["patch_size"] = list(tile_size)
        dataset_json = load_json(join(pre, "Dataset995_PB", "dataset.json"))
        plans_manager = PlansManager(plans)
        num_classes = len(dataset_json["labels"])

        # MLAGG_BENCH_TINY=1: machinery smoke (CPU) with a shrunken net —
        # only the full flagship on the real chip is a meaningful number
        model = MLLAUper(
            out_channels=num_classes,
            embed_dim=16 if tiny else 96, patch_size=2,
            depths=(1, 1, 1, 1) if tiny else (2, 2, 2, 2),
            num_heads=(2, 2, 2, 2) if tiny else (2, 4, 8, 16), mlp_ratio=2,
            sr_ratio=(16, 8, 4, 2), drop_path_rate=0.1,
            deep_supervision=True,
        )
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, *tile_size, 1), jnp.float32)
        params = jax.jit(
            lambda: model.init({"params": key, "dropout": key}, x0)
        )()["params"]

        predictor = NNUNetPredictor(use_mirroring=True)
        predictor.manual_initialization(
            model, plans_manager, plans_manager.get_configuration("2d"),
            [params] * n_folds, dataset_json,
            "nnUNetTrainer_MLAgg_2D_dt_MS", (0, 1),
        )

        src = join(raw, "Dataset995_PB", "imagesTr")
        out = os.path.join(root, "out")

        # warmup: compile the volume graph for this shape
        first = sorted(os.listdir(src))[0]
        predictor.predict_from_files([[join(src, first)]],
                                     [os.path.join(root, "warm")])

        trace_dir = tempfile.mkdtemp(prefix="predtrace_")
        jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        predictor.predict_from_files(src, out)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()

        n_out = len([f for f in os.listdir(out) if f.endswith(".nii.gz")])
        assert n_out == n_volumes, (n_out, n_volumes)
        busy_us, _ = _iter_device_ops(trace_dir)

    busy_s = busy_us / 1e6
    idle_pct = max(0.0, 1.0 - busy_s / wall) * 100.0
    # 2026-08-21 on-chip run: wall was 380 s for 8 volumes, dominated by
    # order-3 preprocessing on this runner's SINGLE host core (~47 s/vol
    # vs ~0.8 s device compute) — idle% here measures host cores, not the
    # device pipeline. ALSO: the trace reported 0.138 s busy (vs >=6 s of
    # actual sliding-window compute) — device events dispatched from the
    # predictor's background threads are not all captured through the
    # axon tunnel, so treat device_busy_s as a LOWER bound.
    if busy_s < 0.5:
        print("# WARNING: device_busy_s implausibly low - background-"
              "thread device events likely missing from the trace; "
              "treat as a lower bound", file=sys.stderr)
    print(json.dumps({
        "n_volumes": n_volumes,
        "n_folds": n_folds,
        "wall_s": round(wall, 3),
        "device_busy_s": round(busy_s, 3),
        "chip_idle_pct": round(idle_pct, 1),
        "volumes_per_sec": round(n_volumes / wall, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()


