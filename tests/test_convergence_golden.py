"""Training-dynamics convergence golden (slow).

Trains OUR flagship trainer (tiny MLLA_Uper, torch-converted identical
init) on the exact batch sequence recorded by
tools/gen_convergence_golden.py and asserts the final online pseudo-dice
lands in the band the reference torch run established. Catches
optimizer/LR-schedule/loss/bf16/fused-norm-in-training drift that forward
parity cannot (reference recipe: nnUNetTrainer_MLAgg_2D_dt_MS.py:137-147,
train loop nnUNetTrainer.py:833-862,943-975).
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import convergence_task as task  # noqa: E402
import reference_torch as rt  # noqa: E402

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / \
    "convergence_golden.json"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not rt.available(),
                       reason="/root/reference not mounted"),
    pytest.mark.skipif(not GOLDEN_PATH.is_file(),
                       reason="golden not generated"),
]


class _SeqLoader:
    """Deterministic stand-in for the training dataloader: each epoch
    yields the next `per_epoch` precomputed batches."""

    def __init__(self, batches, per_epoch, cycle=False):
        self._batches = batches
        self._per_epoch = per_epoch
        self._cycle = cycle
        self._pos = 0

    def __iter__(self):
        for _ in range(self._per_epoch):
            idx = self._pos % len(self._batches) if self._cycle else self._pos
            data, seg = self._batches[idx]
            self._pos += 1
            yield {"data": data, "target": seg.astype(np.int32)}

    def stop(self):
        pass


def _tiny_flagship_builder(configuration_manager, num_input_channels,
                           num_output_channels, deep_supervision):
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    c = task.CONFIG
    return MLLAUper(
        out_channels=num_output_channels, embed_dim=c["embed_dim"],
        patch_size=2, depths=tuple(c["depths"]),
        num_heads=tuple(c["num_heads"]), mlp_ratio=c["mlp_ratio"],
        sr_ratio=tuple(c["sr_ratio"]), drop_path_rate=c["drop_path"],
        deep_supervision=deep_supervision)


def _torch_init_params(template_params):
    """Reference torch init (same seed as the golden run) -> flax tree via
    the production converter."""
    import flax
    import jax.numpy as jnp
    import torch

    from mlagg_unet_tpu.training.torch_import import (
        convert_reference_flagship_state_dict,
    )

    c = task.CONFIG
    _, fl = rt.load_reference_modules()
    torch.manual_seed(c["seed_init"])
    net = fl.MLLA_Uper(
        img_size=c["size"], patch_size=2, in_channels=1,
        out_channels=c["n_classes"], embed_dim=c["embed_dim"],
        depths=c["depths"], num_heads=c["num_heads"],
        mlp_ratio=c["mlp_ratio"], qkv_bias=True, drop_rate=0.0,
        attn_drop_rate=0.0, dropout_path_rate=c["drop_path"],
        sr_ratio=list(c["sr_ratio"]), deep_supervision=True)
    converted = convert_reference_flagship_state_dict(net.state_dict())

    new_params = flax.core.unfreeze(
        jax.tree_util.tree_map(lambda x: x, template_params))
    n_set = 0
    for key, val in converted.items():
        node = new_params
        path = key.split("/")
        for p in path[:-1]:
            node = node[p]
        assert tuple(node[path[-1]].shape) == tuple(val.shape), key
        node[path[-1]] = jnp.asarray(val)
        n_set += 1
    n_leaves = len(jax.tree_util.tree_leaves(template_params))
    assert n_set == n_leaves, (n_set, n_leaves)
    return new_params


import jax  # noqa: E402


def test_convergence_matches_torch_golden(tmp_path):
    from dataclasses import replace as dc_replace

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.training import registry as reg
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU

    golden = json.loads(GOLDEN_PATH.read_text())
    c = task.CONFIG
    # the golden must have been generated from this task config
    for k, v in golden["config"].items():
        cur = c[k]
        cur = list(cur) if isinstance(cur, tuple) else cur
        assert cur == v, f"golden stale for CONFIG[{k}]: {v} != {cur}"

    paths.nnUNet_results = str(tmp_path)
    paths.nnUNet_preprocessed = str(tmp_path)

    plans = {
        "dataset_name": "Dataset997_ConvGolden",
        "plans_name": "nnUNetPlans",
        "image_reader_writer": "SimpleITKIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "configurations": {
            "2d": {
                "data_identifier": "nnUNetPlans_2d",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": c["batch"],
                "patch_size": list(c["size"]),
                "batch_dice": c["batch_dice"],
                "spacing": [1.0, 1.0],
                "normalization_schemes": ["ZScoreNormalization"],
                "use_mask_for_norm": [False],
                "pool_op_kernel_sizes": [[1, 1]] + [[2, 2]] * 4,
                "conv_kernel_sizes": [[3, 3]] * 5,
            }
        },
    }
    dataset_json = {
        "labels": {"background": 0, "blob_a": 1, "blob_b": 2},
        "channel_names": {"0": "img"},
        "numTraining": 8,
        "file_ending": ".nii.gz",
    }

    flag = reg.TRAINER_REGISTRY["nnUNetTrainer_MLAgg_2D_dt_MS"]
    reg.NETWORK_BUILDERS["_tiny_flagship"] = _tiny_flagship_builder
    reg.TRAINER_REGISTRY["_test_convergence"] = dc_replace(
        flag, name="_test_convergence", num_epochs=c["epochs"],
        num_iterations_per_epoch=c["iters_per_epoch"],
        num_val_iterations_per_epoch=c["val_batches"],
        warmup_epochs=c["warmup_epochs"], network="_tiny_flagship",
    )
    assert flag.initial_lr == c["initial_lr"]
    assert flag.weight_decay == c["weight_decay"]
    assert flag.adam_eps == c["adam_eps"]
    assert flag.grad_clip_norm == c["grad_clip"]

    trainer = NNUNetTrainerTPU(plans, "2d", 0, dataset_json,
                               trainer_name="_test_convergence",
                               unpack_data=False)
    assert trainer.configuration_manager.batch_dice == c["batch_dice"]
    trainer.initialize()
    # identical init to the torch golden run, through the production
    # converter (tested by test_torch_parity)
    trainer.params = jax.device_put(_torch_init_params(trainer.params),
                                    trainer.rep_sharding)
    trainer.opt_state = jax.device_put(
        trainer.optimizer.init(trainer.params), trainer.rep_sharding)

    train_batches, val_batches = task.make_batches()

    def fake_get_dataloaders():
        trainer.dataloader_train = _SeqLoader(
            train_batches, c["iters_per_epoch"])
        trainer.dataloader_val = _SeqLoader(
            val_batches, c["val_batches"], cycle=True)
        return trainer.dataloader_train, trainer.dataloader_val

    trainer.get_dataloaders = fake_get_dataloaders
    trainer.run_training()

    lg = trainer.logger.my_fantastic_logging
    ours = float(lg["mean_fg_dice"][-1])
    theirs = float(golden["final_mean_fg_dice"])
    # band: identical init + identical batches; bf16-vs-fp32 and framework
    # rounding may drift trajectories, but a broken optimizer/LR/loss/
    # fused-norm misses the task dice by far more than 0.05
    assert ours >= theirs - 0.05, (
        f"final pseudo-dice {ours:.4f} below torch golden {theirs:.4f} "
        f"- 0.05 band")
    # loss must have actually converged, not just dice by luck
    assert lg["train_losses"][-1] < golden["first_epoch_loss"] - 0.3
    # and stay in the torch run's neighborhood
    assert abs(lg["train_losses"][-1] - golden["final_epoch_loss"]) < 0.3, (
        lg["train_losses"][-1], golden["final_epoch_loss"])
