"""Training runtime — the nnUNetTrainer equivalent, TPU-first.

Reference: training/nnUNetTrainer/nnUNetTrainer.py:63-1223. Lifecycle parity:
initialize (build net/optimizer/loss) -> epoch loop (num_iterations_per_epoch
train steps + num_val_iterations_per_epoch val steps) -> online pseudo-dice
with EMA-best checkpointing -> final checkpoint. 5-fold split management
reproduces sklearn.KFold(5, shuffle, seed 12345) exactly.

TPU-first departures:
* the train step is ONE jitted function (fwd + loss + bwd + optimizer
  update + grad-clip), donated buffers, batch sharded over the mesh 'data'
  axis. AMP/GradScaler are unnecessary (bf16 has fp32 range).
* deep-supervision targets are computed on device (strided nearest
  downsampling) instead of in the host aug pipeline.
* the DDP machinery (mp.spawn, NCCL groups, AllGatherGrad, uneven per-rank
  batches, :283-328) is replaced by GSPMD sharding: metrics/dice sums over
  the sharded batch ARE the cross-device reductions.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mlagg_unet_tpu import paths
from mlagg_unet_tpu.data.augment import (
    DA5TrainingTransforms,
    TrainingTransforms,
    ValidationTransforms,
    get_patch_size,
)
from mlagg_unet_tpu.data.dataset import nnUNetDataset, unpack_dataset
from mlagg_unet_tpu.data.loader import (
    PrefetchLoader,
    ProcessPrefetchLoader,
    nnUNetDataLoader2D,
    nnUNetDataLoader3D,
)
from mlagg_unet_tpu.parallel.mesh import get_data_mesh
from mlagg_unet_tpu.plans.label_handling import determine_num_input_channels
from mlagg_unet_tpu.plans.plans_handler import PlansManager
from mlagg_unet_tpu.training import losses
from mlagg_unet_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from mlagg_unet_tpu.training.logger import NNUNetLogger
from mlagg_unet_tpu.training.lr_schedule import (
    cosine_warmup_lr,
    epoch_schedule_to_step_schedule,
    poly_lr,
)
from mlagg_unet_tpu.training.registry import (
    TrainerConfig,
    get_network_builder,
    get_trainer_config,
)
from mlagg_unet_tpu.utils.helpers import (
    isfile,
    join,
    load_json,
    maybe_mkdir_p,
    save_json,
)
from mlagg_unet_tpu.configuration import ANISO_THRESHOLD, default_n_proc_DA


def kfold_like_sklearn(keys: List[str], n_splits: int = 5, seed: int = 12345
                       ) -> List[Dict[str, List[str]]]:
    """Replicates sklearn.model_selection.KFold(n_splits, shuffle=True,
    random_state=seed) used by the reference do_split (:488-550):
    permutation of indices, then contiguous folds with the remainder spread
    over the first folds."""
    keys = sorted(keys)
    n = len(keys)
    rng = np.random.RandomState(seed)
    idx = np.arange(n)
    rng.shuffle(idx)
    fold_sizes = np.full(n_splits, n // n_splits, dtype=int)
    fold_sizes[: n % n_splits] += 1
    splits = []
    current = 0
    for fs in fold_sizes:
        test_idx = idx[current: current + fs]
        train_idx = np.concatenate([idx[:current], idx[current + fs:]])
        splits.append({
            "train": [keys[i] for i in sorted(train_idx)],
            "val": [keys[i] for i in sorted(test_idx)],
        })
        current += fs
    return splits


def convert_seg_to_regions(seg: jnp.ndarray, regions, ignore_label=None
                           ) -> jnp.ndarray:
    """(B, *sp) int -> (B, *sp, n_regions[+1]) one-hot region channels;
    ignore channel appended last when ignore_label is set (matching
    ConvertSegmentationToRegionsTransform + DC_and_BCE contract)."""
    chans = []
    for reg in regions:
        if isinstance(reg, (tuple, list)):
            m = jnp.zeros(seg.shape, bool)
            for r in reg:
                m = m | (seg == r)
        else:
            m = seg == reg
        chans.append(m)
    if ignore_label is not None:
        chans.append(seg == ignore_label)
    return jnp.stack(chans, axis=-1).astype(jnp.float32)


class NNUNetTrainerTPU:
    def __init__(
        self,
        plans: dict,
        configuration: str,
        fold: int,
        dataset_json: dict,
        trainer_name: str = "nnUNetTrainer",
        unpack_data: bool = True,
        num_devices: Optional[int] = None,
    ):
        self.plans_manager = PlansManager(plans)
        self.configuration_manager = self.plans_manager.get_configuration(
            configuration)
        self.configuration_name = configuration
        self.dataset_json = dataset_json
        self.fold = fold
        self.trainer_name = trainer_name
        self.cfg: TrainerConfig = get_trainer_config(trainer_name)
        self.unpack_data = unpack_data

        self.label_manager = self.plans_manager.get_label_manager(dataset_json)
        self.num_input_channels = determine_num_input_channels(
            self.plans_manager, self.configuration_manager, dataset_json
        )

        self.preprocessed_dataset_folder_base = join(
            paths.nnUNet_preprocessed, self.plans_manager.dataset_name
        )
        self.preprocessed_dataset_folder = join(
            self.preprocessed_dataset_folder_base,
            self.configuration_manager.data_identifier,
        )
        self.output_folder_base = join(
            paths.nnUNet_results, self.plans_manager.dataset_name,
            f"{trainer_name}__{self.plans_manager.plans_name}__{configuration}",
        )
        self.output_folder = join(self.output_folder_base, f"fold_{fold}")

        # the global batch must divide evenly over the data axis; use the
        # largest device count that divides it (the reference instead
        # rebalances uneven per-rank batches, :283-328 — unnecessary here)
        import jax as _jax

        avail = len(_jax.devices()) if num_devices is None else num_devices
        bs = self.configuration_manager.batch_size
        while avail > 1 and bs % avail != 0:
            avail -= 1
        self.mesh = get_data_mesh(avail)
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.rep_sharding = NamedSharding(self.mesh, P())

        self.logger = NNUNetLogger()
        self.current_epoch = 0
        self._best_ema = None

        self.network = None
        self.params = None
        self.opt_state = None
        self.was_initialized = False
        self.log_file = None

    # ------------------------------------------------------------------
    # config derivations
    # ------------------------------------------------------------------
    def _get_deep_supervision_scales(self):
        if not self.cfg.enable_deep_supervision:
            return None
        if self.cfg.deep_supervision_scales_override is not None:
            return [list(s) for s in self.cfg.deep_supervision_scales_override]
        return [
            list(i) for i in 1 / np.cumprod(
                np.vstack(self.configuration_manager.pool_op_kernel_sizes),
                axis=0,
            )
        ][:-1]

    def _get_ds_weights(self, num_scales: int) -> List[float]:
        w = np.array([1 / (2 ** i) for i in range(num_scales)])
        if self.cfg.deep_supervision_scales_override is None and num_scales > 1:
            # default trainer zeroes the lowest resolution (:344-351)
            w[-1] = 0
        w = w / w.sum()
        return list(w)

    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        """reference :354-410."""
        patch_size = self.configuration_manager.patch_size
        dim = len(patch_size)
        if dim == 2:
            do_dummy_2d = False
            if max(patch_size) / min(patch_size) > 1.5:
                rotation = {"x": (-np.pi / 12, np.pi / 12), "y": (0, 0),
                            "z": (0, 0)}
            else:
                rotation = {"x": (-np.pi, np.pi), "y": (0, 0), "z": (0, 0)}
            mirror_axes = (0, 1)
        elif dim == 3:
            do_dummy_2d = (max(patch_size) / patch_size[0]) > ANISO_THRESHOLD
            if do_dummy_2d:
                rotation = {"x": (-np.pi, np.pi), "y": (0, 0), "z": (0, 0)}
            else:
                rotation = {"x": (-np.pi / 6, np.pi / 6),
                            "y": (-np.pi / 6, np.pi / 6),
                            "z": (-np.pi / 6, np.pi / 6)}
            mirror_axes = (0, 1, 2)
        else:
            raise RuntimeError()

        initial_patch_size = get_patch_size(
            patch_size[-dim:], rotation["x"], rotation["y"], rotation["z"],
            (0.85, 1.25),
        )
        if do_dummy_2d:
            initial_patch_size[0] = patch_size[0]
        self.inference_allowed_mirroring_axes = mirror_axes
        return rotation, do_dummy_2d, initial_patch_size, mirror_axes

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def initialize(self):
        assert not self.was_initialized
        maybe_mkdir_p(self.output_folder)

        builder = get_network_builder(self.cfg.network)
        self.network = builder(
            self.configuration_manager, self.num_input_channels,
            self.label_manager.num_segmentation_heads,
            self.cfg.enable_deep_supervision,
        )

        dim = len(self.configuration_manager.patch_size)
        example = jnp.zeros(
            (1, *self.configuration_manager.patch_size, self.num_input_channels),
            jnp.float32,
        )
        key = jax.random.PRNGKey(12345 + self.fold)
        variables = self.network.init({"params": key, "dropout": key}, example)
        self.params = jax.device_put(variables["params"], self.rep_sharding)
        # non-param collections (e.g. BatchNorm running stats for the BN
        # trainer variant); empty dict for the common instance-norm nets
        self.model_state = jax.device_put(
            {k: v for k, v in variables.items() if k != "params"},
            self.rep_sharding)

        self.ds_scales = self._get_deep_supervision_scales()
        steps_per_epoch = self.cfg.num_iterations_per_epoch
        if self.cfg.lr_scheduler == "poly":
            epoch_sched = poly_lr(self.cfg.initial_lr, self.cfg.num_epochs)
        elif self.cfg.lr_scheduler == "cosine_warmup":
            epoch_sched = cosine_warmup_lr(
                self.cfg.initial_lr, self.cfg.num_epochs,
                warmup_epochs=self.cfg.warmup_epochs,
            )
        else:
            epoch_sched = lambda e: self.cfg.initial_lr  # noqa: E731
        schedule = epoch_schedule_to_step_schedule(epoch_sched, steps_per_epoch)

        if self.cfg.optimizer == "sgd":
            opt = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_clip_norm),
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.sgd(schedule, momentum=0.99, nesterov=True),
            )
        elif self.cfg.optimizer == "adamw":
            opt = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_clip_norm),
                optax.adamw(schedule, eps=self.cfg.adam_eps,
                            weight_decay=self.cfg.weight_decay),
            )
        elif self.cfg.optimizer == "adan":
            from mlagg_unet_tpu.training.adan import adan

            opt = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_clip_norm),
                adan(schedule, weight_decay=self.cfg.weight_decay),
            )
        elif self.cfg.optimizer == "adamw_amsgrad":
            # nnUNetTrainerAdam: AdamW(amsgrad=True) — amsgrad second moment
            # + decoupled weight decay
            opt = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_clip_norm),
                optax.scale_by_amsgrad(eps=self.cfg.adam_eps),
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.scale_by_learning_rate(schedule),
            )
        elif self.cfg.optimizer == "adam_l2":
            # nnUNetTrainerVanillaAdam: torch.optim.Adam with coupled L2
            # weight decay (decay added to the gradient before adam scaling)
            opt = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_clip_norm),
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.adam(schedule, eps=self.cfg.adam_eps),
            )
        else:
            raise ValueError(self.cfg.optimizer)
        self.optimizer = opt
        self.opt_state = jax.device_put(opt.init(self.params),
                                        self.rep_sharding)

        self._build_step_fns()
        self.was_initialized = True
        self._save_debug_information()

    def _save_debug_information(self):
        """Environment + config dump (reference nnUNetTrainer.py:215-248)."""
        import jax as _jax

        try:
            dct = {
                "trainer_name": self.trainer_name,
                "trainer_config": {
                    k: getattr(self.cfg, k)
                    for k in self.cfg.__dataclass_fields__
                },
                "configuration_name": self.configuration_name,
                "configuration": self.configuration_manager.configuration,
                "fold": self.fold,
                "num_input_channels": self.num_input_channels,
                "jax_version": _jax.__version__,
                "backend": _jax.default_backend(),
                "devices": [str(d) for d in _jax.devices()],
                "mesh": str(self.mesh),
            }
            maybe_mkdir_p(self.output_folder)
            save_json(dct, join(self.output_folder, "debug.json"))
        except Exception:
            pass

    # ------------------------------------------------------------------
    # loss / steps
    # ------------------------------------------------------------------
    def _loss_for_outputs(self, outputs, target):
        """outputs: list (DS) or single array, channels-last logits.
        target: (B, *sp) int."""
        lm = self.label_manager
        batch_dice = self.configuration_manager.batch_dice

        loss_kind = self.cfg.loss
        if lm.has_regions:
            def single(o, t):
                t_regions = convert_seg_to_regions(
                    t, lm.all_regions, lm.ignore_label
                )
                return losses.dc_and_bce_loss(
                    o, t_regions, batch_dice=batch_dice,
                    use_ignore_label=lm.has_ignore_label,
                )
        elif loss_kind == "ce":
            def single(o, t):
                return losses.robust_cross_entropy_loss(
                    o, t, ignore_index=lm.ignore_label)
        elif loss_kind == "dice":
            def single(o, t):
                mask = ((t != lm.ignore_label).astype(jnp.float32)
                        if lm.has_ignore_label else None)
                td = (jnp.where(t == lm.ignore_label, 0, t)
                      if lm.has_ignore_label else t)
                return losses.memory_efficient_soft_dice_loss(
                    o, td, batch_dice=batch_dice, do_bg=False,
                    smooth=1e-5, loss_mask=mask)
        elif loss_kind == "dc_topk":
            def single(o, t):
                return losses.dc_and_topk_loss(
                    o, t, batch_dice=batch_dice, do_bg=False,
                    ignore_label=lm.ignore_label)
        elif loss_kind in ("topk10", "topk10_ls01"):
            # pure TopK CE (nnUNetTrainerTopk10Loss / ...LS01)
            ls = 0.1 if loss_kind == "topk10_ls01" else 0.0

            def single(o, t):
                return losses.topk_cross_entropy_loss(
                    o, t, k_percent=10.0, label_smoothing=ls,
                    ignore_index=lm.ignore_label)
        else:
            def single(o, t):
                return losses.dc_and_ce_loss(
                    o, t, batch_dice=batch_dice, do_bg=False,
                    ignore_label=lm.ignore_label,
                )

        if self.cfg.enable_deep_supervision and isinstance(outputs, (list, tuple)):
            targets = losses.downsample_seg_for_ds(target, self.ds_scales)
            weights = self._get_ds_weights(len(outputs))
            return losses.deep_supervision_loss(single, outputs, targets, weights)
        out = outputs[0] if isinstance(outputs, (list, tuple)) else outputs
        return single(out, target)

    def _build_step_fns(self):
        network = self.network
        lm = self.label_manager
        compute_dtype = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                         else jnp.float32)

        def cast(tree):
            if compute_dtype == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

        has_state = bool(self.model_state)

        def train_step(params, model_state, opt_state, data, target, rng):
            def loss_fn(p):
                # bf16 forward on cast params/activations; fp32 master params
                # and loss (the reference's AMP autocast, nnUNetTrainer :848)
                if has_state:
                    outputs, new_state = network.apply(
                        {"params": cast(p), **model_state}, cast(data),
                        False, rngs={"dropout": rng},
                        mutable=list(model_state.keys()))
                else:
                    outputs = network.apply({"params": cast(p)}, cast(data),
                                            False, rngs={"dropout": rng})
                    new_state = model_state
                return self._loss_for_outputs(outputs, target), new_state

            (loss, model_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, model_state, opt_state, loss

        def val_step(params, model_state, data, target):
            outputs = network.apply({"params": cast(params), **model_state},
                                    cast(data))
            loss = self._loss_for_outputs(outputs, target)
            out = outputs[0] if isinstance(outputs, (list, tuple)) else outputs
            # online pseudo-dice (reference :895-941): hard preds, fg classes
            if lm.has_regions:
                pred = (jax.nn.sigmoid(out) > 0.5).astype(jnp.float32)
                tgt = convert_seg_to_regions(target, lm.all_regions)
                mask = (target != lm.ignore_label).astype(jnp.float32) \
                    if lm.has_ignore_label else None
            else:
                n_cls = out.shape[-1]
                pred = jax.nn.one_hot(jnp.argmax(out, -1), n_cls)[..., 1:]
                tgt_for_onehot = (
                    jnp.where(target == lm.ignore_label, 0, target)
                    if lm.has_ignore_label else target
                )
                tgt = jax.nn.one_hot(tgt_for_onehot, n_cls)[..., 1:]
                mask = (target != lm.ignore_label).astype(jnp.float32) \
                    if lm.has_ignore_label else None
            tp, fp, fn, _ = losses.get_tp_fp_fn_tn(pred, tgt, mask)
            return loss, tp, fp, fn

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._val_step = jax.jit(val_step)

    # ------------------------------------------------------------------
    # split / dataloaders
    # ------------------------------------------------------------------
    def do_split(self) -> Tuple[List[str], List[str]]:
        from mlagg_unet_tpu.data.dataset import get_case_identifiers

        case_identifiers = get_case_identifiers(self.preprocessed_dataset_folder)
        if self.fold == "all":
            return case_identifiers, case_identifiers

        splits_file = join(self.preprocessed_dataset_folder_base,
                           "splits_final.json")
        if not isfile(splits_file):
            splits = kfold_like_sklearn(case_identifiers, 5)
            save_json(splits, splits_file)
        else:
            splits = load_json(splits_file)
        if self.fold < len(splits):
            tr_keys = splits[self.fold]["train"]
            val_keys = splits[self.fold]["val"]
        else:
            # reference falls back to a random 80:20 (:531-541)
            rnd = np.random.RandomState(12345 + self.fold)
            keys = np.array(case_identifiers)
            idx = rnd.choice(len(keys), len(keys), replace=False)
            n_tr = int(len(keys) * 0.8)
            tr_keys = keys[idx[:n_tr]].tolist()
            val_keys = keys[idx[n_tr:]].tolist()
        return tr_keys, val_keys

    def get_dataloaders(self):
        patch_size = self.configuration_manager.patch_size
        dim = len(patch_size)
        (rotation, do_dummy_2d, initial_patch_size, mirror_axes) = (
            self.configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        )
        if self.cfg.disable_mirroring:
            mirror_axes = ()
            self.inference_allowed_mirroring_axes = ()
        elif self.cfg.mirror_axes_override is not None:
            # nnUNetTrainer_onlyMirror01: axes 0,1 in 3D / axis 0 in 2D
            allowed = tuple(a for a in self.cfg.mirror_axes_override
                            if a < dim - (0 if dim == 3 else 1))
            mirror_axes = allowed
            self.inference_allowed_mirroring_axes = allowed

        tr_keys, val_keys = self.do_split()
        prev_stage_folder = None
        if self.configuration_manager.previous_stage_name is not None:
            prev_stage_folder = join(
                self.output_folder_base.replace(
                    f"__{self.configuration_name}",
                    f"__{self.configuration_manager.previous_stage_name}",
                ),
                "predicted_next_stage", self.configuration_name,
            )
        ds_tr = nnUNetDataset(self.preprocessed_dataset_folder, tr_keys,
                              prev_stage_folder)
        ds_val = nnUNetDataset(self.preprocessed_dataset_folder, val_keys,
                               prev_stage_folder)

        is_cascaded = self.configuration_manager.previous_stage_name is not None
        fg_labels = self.label_manager.foreground_labels
        if self.cfg.disable_da:
            tr_transforms = ValidationTransforms(
                patch_size, is_cascaded, fg_labels)
            sample_patch = list(patch_size)
        else:
            tf_cls = (DA5TrainingTransforms if self.cfg.da_level == "DA5"
                      else TrainingTransforms)
            tr_transforms = tf_cls(
                list(patch_size), rotation, mirror_axes, do_dummy_2d,
                self.configuration_manager.use_mask_for_norm,
                order_resampling_data=self.cfg.order_resampling_data,
                order_resampling_seg=self.cfg.order_resampling_seg,
                is_cascaded=is_cascaded, foreground_labels=fg_labels,
            )
            sample_patch = list(initial_patch_size)
        val_transforms = ValidationTransforms(patch_size, is_cascaded,
                                              fg_labels)

        # fused on-device augmentation (opt-in performance path): workers
        # only crop the inflated patch; the transform stack runs jitted on
        # the accelerator (data/device_augment.py). Host path remains the
        # default and handles dummy-2D / cascade / DA5. 'ord3' (or '1')
        # runs the reference-default interpolation semantics (order-3
        # cubic data / order-1 one-hot seg / order-3 lowres upsample,
        # scipy-exact); 'ord1' is a named opt-in for the faster order-1/0
        # profile, which deviates from nnUNetTrainer.py:649-650.
        from mlagg_unet_tpu.data.device_augment import parse_device_aug_flag

        dev_aug_mode = parse_device_aug_flag(
            os.environ.get("MLAGG_DEVICE_AUG", ""))
        use_device_aug = (
            bool(dev_aug_mode)
            and not self.cfg.disable_da and not do_dummy_2d
            and not is_cascaded and self.cfg.da_level != "DA5"
        )
        device_aug = None
        if use_device_aug:
            from mlagg_unet_tpu.data.device_augment import (
                DeviceAugLoader,
                DeviceTrainingTransforms,
            )

            device_aug = DeviceTrainingTransforms(
                patch_size, rotation, mirror_axes, interp=dev_aug_mode,
                num_classes=max(self.label_manager.all_labels) + 1)
            tr_transforms = None  # loader emits the inflated patch

        annotated_key = tuple(self.label_manager.all_labels)
        loader_cls = nnUNetDataLoader2D if dim == 2 else nnUNetDataLoader3D
        batch_size = self.configuration_manager.batch_size

        oversample = self.cfg.oversample_foreground_percent
        if self.cfg.probabilistic_oversampling and oversample < 0:
            # sentinel: replicate the deterministic sampler's effective
            # percent for this batch size (reference sampling/:19-26)
            oversample = float(np.mean(
                [i >= round(batch_size * (1 - 0.33))
                 for i in range(batch_size)]))

        def make_tr(worker_id):
            return loader_cls(
                ds_tr, batch_size, sample_patch, list(patch_size),
                oversample,
                annotated_classes_key=annotated_key,
                has_ignore=self.label_manager.has_ignore_label,
                transforms=tr_transforms, seed=1000 + worker_id,
                probabilistic_oversampling=self.cfg.probabilistic_oversampling,
            )

        def make_val(worker_id):
            return loader_cls(
                ds_val, batch_size, list(patch_size), list(patch_size),
                oversample,
                annotated_classes_key=annotated_key,
                has_ignore=self.label_manager.has_ignore_label,
                transforms=val_transforms, seed=2000 + worker_id,
            )

        n_proc = default_n_proc_DA
        # 3D augmentation is dominated by GIL-holding NumPy (order-3
        # spatial + seg one-hot interpolation) where threads give zero
        # scaling — use fork processes there, threads for the cheap 2D
        # stacks (measured 10.3 b/s vs 4 needed). Override with
        # MLAGG_DA_BACKEND=threads|processes.
        backend = os.environ.get("MLAGG_DA_BACKEND",
                                 "processes" if dim == 3 else "threads")
        loader_pool = ProcessPrefetchLoader if backend == "processes" \
            else PrefetchLoader
        self.dataloader_train = loader_pool(
            make_tr, num_workers=n_proc, queue_size=6,
            num_batches_per_epoch=self.cfg.num_iterations_per_epoch,
        )
        if use_device_aug:
            from mlagg_unet_tpu.data.device_augment import DeviceAugLoader

            self.dataloader_train = DeviceAugLoader(
                self.dataloader_train, device_aug,
                seed=777 + (0 if self.fold == "all" else int(self.fold)))
        self.dataloader_val = loader_pool(
            make_val, num_workers=max(1, n_proc // 2), queue_size=3,
            num_batches_per_epoch=self.cfg.num_val_iterations_per_epoch,
        )
        return self.dataloader_train, self.dataloader_val

    # ------------------------------------------------------------------
    # logging
    # ------------------------------------------------------------------
    def print_to_log_file(self, *args, also_print_to_console: bool = True):
        maybe_mkdir_p(self.output_folder)
        if self.log_file is None:
            timestamp = time.strftime("%Y_%m_%d_%H_%M_%S")
            self.log_file = join(self.output_folder,
                                 f"training_log_{timestamp}.txt")
        msg = " ".join(str(a) for a in args)
        with open(self.log_file, "a") as f:
            f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')}: {msg}\n")
        if also_print_to_console:
            print(msg, flush=True)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def save_checkpoint(self, filename: str):
        state = {
            "network_weights": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
            "current_epoch": self.current_epoch + 1,
            "logging": self.logger.get_checkpoint(),
            "_best_ema": self._best_ema,
            "trainer_name": self.trainer_name,
            "init_args": {
                "configuration": self.configuration_name,
                "fold": self.fold,
            },
            "inference_allowed_mirroring_axes": getattr(
                self, "inference_allowed_mirroring_axes", None),
        }
        save_checkpoint(state, join(self.output_folder, filename))

    def load_checkpoint_file(self, path: str):
        ckpt = load_checkpoint(path)
        self.params = jax.device_put(ckpt["network_weights"], self.rep_sharding)
        if ckpt.get("model_state"):
            self.model_state = jax.device_put(ckpt["model_state"],
                                              self.rep_sharding)
        if ckpt.get("opt_state") is not None and self.opt_state is not None:
            try:
                self.opt_state = jax.tree_util.tree_map(
                    lambda t, s: jax.device_put(jnp.asarray(s), self.rep_sharding),
                    self.opt_state, ckpt["opt_state"],
                )
            except Exception:
                pass
        self.current_epoch = ckpt["current_epoch"]
        self.logger.load_checkpoint(ckpt["logging"])
        self._best_ema = ckpt["_best_ema"]
        self.inference_allowed_mirroring_axes = ckpt.get(
            "inference_allowed_mirroring_axes")

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------
    def run_training(self):
        if not self.was_initialized:
            self.initialize()
        if self.unpack_data:
            unpack_dataset(self.preprocessed_dataset_folder, num_processes=4)
        self.get_dataloaders()
        rng = jax.random.PRNGKey(self.fold if self.fold != "all" else 0)

        cached_batch = None
        if self.cfg.no_data_loading:
            # benchmark mode: one cached dummy batch isolates device speed
            # (reference nnUNetTrainerBenchmark_5epochs_noDataLoading)
            b = self.dataloader_train.get_batch()
            cached_batch = {
                "data": jax.device_put(b["data"], self.batch_sharding),
                "target": jax.device_put(b["target"], self.batch_sharding),
            }

        save_every = 50
        # tracing/profiling: set MLAGG_PROFILE_DIR to capture a jax.profiler
        # trace of epoch 1 (the reference has no profiler at all; SURVEY §5)
        profile_dir = os.environ.get("MLAGG_PROFILE_DIR")
        try:
            for epoch in range(self.current_epoch, self.cfg.num_epochs):
                if profile_dir and epoch == 1:
                    jax.profiler.start_trace(profile_dir)
                self.logger.log("epoch_start_timestamps", time.time(), epoch)
                train_losses = []
                if cached_batch is not None:
                    for _ in range(self.cfg.num_iterations_per_epoch):
                        rng, step_rng = jax.random.split(rng)
                        (self.params, self.model_state, self.opt_state,
                         loss) = self._train_step(
                            self.params, self.model_state, self.opt_state,
                            cached_batch["data"], cached_batch["target"],
                            step_rng,
                        )
                        train_losses.append(loss)
                else:
                    for batch in self.dataloader_train:
                        rng, step_rng = jax.random.split(rng)
                        data = jax.device_put(batch["data"],
                                              self.batch_sharding)
                        target = jax.device_put(batch["target"],
                                                self.batch_sharding)
                        (self.params, self.model_state, self.opt_state,
                         loss) = self._train_step(
                            self.params, self.model_state, self.opt_state,
                            data, target, step_rng
                        )
                        train_losses.append(loss)
                jax.block_until_ready(train_losses[-1])
                tr_loss = float(np.mean([float(l) for l in train_losses]))
                if not np.isfinite(tr_loss):
                    # divergence guard (reference ships check_nan_inf,
                    # csms6s.py:128-133). Checked on the epoch mean — the
                    # losses are already on host here, so this adds no
                    # device syncs to the step loop.
                    bad = [i for i, l in enumerate(train_losses)
                           if not np.isfinite(float(l))]
                    raise RuntimeError(
                        f"Non-finite training loss in epoch {epoch} "
                        f"(first bad iteration {bad[0] if bad else '?'} of "
                        f"{len(train_losses)}). Checkpoints up to the "
                        f"previous epoch are intact in "
                        f"{self.output_folder}; resume with --c after "
                        f"lowering the learning rate or inspecting data.")
                self.logger.log("train_losses", tr_loss, epoch)

                val_losses, tps, fps, fns = [], [], [], []
                for batch in self.dataloader_val:
                    data = jax.device_put(batch["data"], self.batch_sharding)
                    target = jax.device_put(batch["target"], self.batch_sharding)
                    loss, tp, fp, fn = self._val_step(
                        self.params, self.model_state, data, target)
                    val_losses.append(float(loss))
                    tps.append(np.asarray(tp))
                    fps.append(np.asarray(fp))
                    fns.append(np.asarray(fn))
                val_loss = float(np.mean(val_losses))
                tp = np.sum(tps, 0)
                fp = np.sum(fps, 0)
                fn = np.sum(fns, 0)
                dice_per_class = [
                    float(2 * i / (2 * i + j + k)) if (2 * i + j + k) > 0 else 0.0
                    for i, j, k in zip(tp, fp, fn)
                ]
                mean_fg_dice = float(np.nanmean(dice_per_class))
                self.logger.log("val_losses", val_loss, epoch)
                self.logger.log("mean_fg_dice", mean_fg_dice, epoch)
                self.logger.log("dice_per_class_or_region", dice_per_class, epoch)
                self.logger.log(
                    "lrs",
                    float(self._current_lr(epoch)), epoch,
                )
                self.logger.log("epoch_end_timestamps", time.time(), epoch)

                self.print_to_log_file(
                    f"Epoch {epoch}: train_loss {tr_loss:.4f} "
                    f"val_loss {val_loss:.4f} "
                    f"pseudo dice {['%.4f' % d for d in dice_per_class]} "
                    f"ema {self.logger.my_fantastic_logging['ema_fg_dice'][epoch]:.4f}"
                )

                if profile_dir and epoch == 1:
                    jax.profiler.stop_trace()

                self.current_epoch = epoch
                ema = self.logger.my_fantastic_logging["ema_fg_dice"][epoch]
                if self._best_ema is None or ema > self._best_ema:
                    self._best_ema = ema
                    self.save_checkpoint("checkpoint_best.ckpt")
                if (epoch + 1) % save_every == 0 or \
                        epoch == self.cfg.num_epochs - 1:
                    self.save_checkpoint("checkpoint_latest.ckpt")
                try:
                    self.logger.plot_progress_png(self.output_folder)
                except Exception:
                    pass

            self.save_checkpoint("checkpoint_final.ckpt")

            if self.cfg.benchmark:
                # fastest-epoch-seconds json keyed by device
                # (reference nnUNetTrainerBenchmark_5epochs.py:36-66)
                lg = self.logger.my_fantastic_logging
                epoch_times = [
                    e - s for s, e in zip(lg["epoch_start_timestamps"],
                                          lg["epoch_end_timestamps"])
                    if s is not None and e is not None
                ]
                import jax as _jax

                result = {
                    "trainer": self.trainer_name,
                    "fastest_epoch": float(np.min(epoch_times)),
                    "epoch_times": [float(t) for t in epoch_times],
                    "device": str(_jax.devices()[0]),
                    "num_devices": self.mesh.size,
                    "jax_version": _jax.__version__,
                }
                save_json({f"{result['device']}__jax_{result['jax_version']}":
                           result},
                          join(self.output_folder, "benchmark_result.json"))
        finally:
            self.dataloader_train.stop()
            self.dataloader_val.stop()

    def perform_actual_validation(self, save_probabilities: bool = False):
        """Final sliding-window validation on the fold's val split
        (reference :1056-1200): predict every val case with the final
        weights + mirror TTA, export through the inverse pipeline, compute
        metrics vs the ground truth, write summary.json. Cascade: also
        exports resampled predictions for the next stage (:1146-1181)."""
        import shutil

        from mlagg_unet_tpu.evaluation.metrics import compute_metrics_on_folder
        from mlagg_unet_tpu.inference.export import (
            export_prediction_from_logits,
            resample_and_save,
        )
        from mlagg_unet_tpu.inference.sliding_window import VolumePredictor

        if not self.was_initialized:
            self.initialize()
            final = join(self.output_folder, "checkpoint_final.ckpt")
            if isfile(final):
                self.load_checkpoint_file(final)

        validation_output_folder = join(self.output_folder, "validation")
        maybe_mkdir_p(validation_output_folder)

        _, val_keys = self.do_split()
        prev_stage_folder = None
        if self.configuration_manager.previous_stage_name is not None:
            prev_stage_folder = join(
                self.output_folder_base.replace(
                    f"__{self.configuration_name}",
                    f"__{self.configuration_manager.previous_stage_name}",
                ),
                "predicted_next_stage", self.configuration_name,
            )
        ds_val = nnUNetDataset(self.preprocessed_dataset_folder, val_keys,
                               prev_stage_folder)

        mirror_axes = getattr(self, "inference_allowed_mirroring_axes", None)
        if mirror_axes is None:
            mirror_axes = tuple(range(
                len(self.configuration_manager.patch_size)))
        tile_size = self.configuration_manager.patch_size
        num_classes = self.label_manager.num_segmentation_heads
        variables = ({"params": self.params, **self.model_state}
                     if self.model_state else self.params)
        predictor = VolumePredictor(
            self.network.apply, variables, tile_size, num_classes,
            tuple(mirror_axes), tile_batch_size=4,
            compute_dtype=jnp.bfloat16,
        )

        next_stages = self.configuration_manager.next_stage_names or []
        for k in val_keys:
            data, seg, properties = ds_val.load_case(k)
            data = np.asarray(data)
            logits = predictor(data)
            export_prediction_from_logits(
                logits, properties, self.configuration_manager,
                self.plans_manager, self.dataset_json,
                join(validation_output_folder, k),
                save_probabilities=save_probabilities,
            )
            for ns in next_stages:
                next_cm = self.plans_manager.get_configuration(ns)
                next_data_dir = join(self.preprocessed_dataset_folder_base,
                                     next_cm.data_identifier)
                if not isfile(join(next_data_dir, k + ".npz")):
                    continue
                next_ds = nnUNetDataset(next_data_dir, [k])
                d_next, _, _ = next_ds.load_case(k)
                out_dir = join(self.output_folder_base,
                               "predicted_next_stage", ns)
                maybe_mkdir_p(out_dir)
                resample_and_save(
                    logits, d_next.shape[1:], join(out_dir, k + ".npz"),
                    self.plans_manager, self.configuration_manager,
                    properties, self.dataset_json,
                )

        gt_folder = join(self.preprocessed_dataset_folder_base,
                         "gt_segmentations")
        if not os.path.isdir(gt_folder):
            gt_folder = join(paths.nnUNet_raw,
                             self.plans_manager.dataset_name, "labelsTr")
        rw = self.plans_manager.image_reader_writer_class()
        lm = self.label_manager
        metrics = compute_metrics_on_folder(
            gt_folder, validation_output_folder,
            join(validation_output_folder, "summary.json"), rw,
            self.dataset_json["file_ending"],
            lm.foreground_regions if lm.has_regions else lm.foreground_labels,
            lm.ignore_label,
        )
        self.print_to_log_file(
            "Validation complete. Mean foreground Dice:",
            metrics["foreground_mean"]["Dice"],
        )
        return metrics

    def _current_lr(self, epoch: int) -> float:
        if self.cfg.lr_scheduler == "poly":
            return poly_lr(self.cfg.initial_lr, self.cfg.num_epochs)(epoch)
        if self.cfg.lr_scheduler == "cosine_warmup":
            return float(cosine_warmup_lr(
                self.cfg.initial_lr, self.cfg.num_epochs,
                warmup_epochs=self.cfg.warmup_epochs)(epoch))
        return self.cfg.initial_lr
