"""5-epoch benchmark-trainer run on the real chip -> benchmark_result.json.

The TPU equivalent of the reference's nnUNetTrainerBenchmark_5epochs_
noDataLoading (variants/benchmarking/nnUNetTrainerBenchmark_5epochs.py:
8-66): the flagship recipe (AdamW + cosine warmup, DC+CE+DS, bf16
compute) runs 5 epochs x 250 train iters + 50 val iters on ONE cached
random batch (isolates device speed from the host loader, exactly the
reference's _noDataLoading semantics) and records the fastest epoch
seconds keyed by device into benchmark_result.json.

Usage: python tools/bench_benchmark_trainer.py [batch] [out_dir]
Prints the benchmark_result.json content.
"""
from __future__ import annotations

import json
import sys
import tempfile
from dataclasses import replace as dc_replace

sys.path.insert(0, "/root/repo")

import numpy as np


class _OneBatchLoader:
    """Yields the same host batch; get_batch() for the cached-batch path."""

    def __init__(self, batch, n_iters):
        self._b = batch
        self._n = n_iters

    def get_batch(self):
        return self._b

    def __iter__(self):
        for _ in range(self._n):
            yield self._b

    def stop(self):
        pass


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.training import registry as reg
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU
    from mlagg_unet_tpu.utils.helpers import join, load_json

    tmp = out_dir or tempfile.mkdtemp(prefix="bench_trainer_")
    paths.nnUNet_results = tmp
    paths.nnUNet_preprocessed = tmp

    patch = [256, 224]
    plans = {
        "dataset_name": "Dataset000_Bench",
        "plans_name": "nnUNetPlans",
        "image_reader_writer": "SimpleITKIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "configurations": {
            "2d_bs10": {
                "data_identifier": "nnUNetPlans_2d",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": batch,
                "patch_size": patch,
                "batch_dice": True,
                "spacing": [1.0, 1.0],
                "normalization_schemes": ["ZScoreNormalization"],
                "use_mask_for_norm": [False],
                "pool_op_kernel_sizes": [[1, 1]] + [[2, 2]] * 4,
                "conv_kernel_sizes": [[3, 3]] * 5,
            }
        },
    }
    dataset_json = {
        "labels": {"background": 0, "a": 1, "b": 2, "c": 3},
        "channel_names": {"0": "img"},
        "numTraining": 10,
        "file_ending": ".nii.gz",
    }

    flag = reg.TRAINER_REGISTRY["nnUNetTrainer_MLAgg_2D_dt_MS"]
    reg.TRAINER_REGISTRY["_bench5_flagship"] = dc_replace(
        flag, name="_bench5_flagship", num_epochs=5,
        benchmark=True, no_data_loading=True)

    trainer = NNUNetTrainerTPU(plans, "2d_bs10", 0, dataset_json,
                               trainer_name="_bench5_flagship",
                               unpack_data=False)
    rng = np.random.RandomState(0)
    host_batch = {
        "data": rng.rand(batch, *patch, 1).astype(np.float32),
        "target": rng.randint(0, 4, (batch, *patch)).astype(np.int32),
    }

    def fake_get_dataloaders():
        trainer.dataloader_train = _OneBatchLoader(
            host_batch, trainer.cfg.num_iterations_per_epoch)
        trainer.dataloader_val = _OneBatchLoader(
            host_batch, trainer.cfg.num_val_iterations_per_epoch)
        return trainer.dataloader_train, trainer.dataloader_val

    trainer.get_dataloaders = fake_get_dataloaders
    trainer.run_training()

    result_path = join(trainer.output_folder, "benchmark_result.json")
    print(json.dumps(load_json(result_path)))


if __name__ == "__main__":
    main()
