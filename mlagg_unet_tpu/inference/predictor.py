"""End-to-end predictor (reference: inference/predict_from_raw_data.py:113-575).

Orchestration parity: initialize from a trained model folder (checkpoint
carries trainer_name + init args so the right architecture is rebuilt,
:83-99), fold ensembling by logits averaging (:261-324), num_parts/part_id
case striping (:185-187), cascade recursion into the previous stage
(:162-178), optional probability export.

TPU-first: preprocessing runs on host threads while the device chews tiles;
fold ensembling reuses the same tile pipeline with per-fold params.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlagg_unet_tpu import paths
from mlagg_unet_tpu.inference.export import (
    export_prediction_from_logits,
    resample_and_save,
)
from mlagg_unet_tpu.inference.sliding_window import VolumePredictor
from mlagg_unet_tpu.plans.fingerprint import (
    create_lists_from_splitted_dataset_folder,
    get_identifiers_from_splitted_dataset_folder,
)
from mlagg_unet_tpu.plans.label_handling import (
    convert_labelmap_to_one_hot,
    determine_num_input_channels,
)
from mlagg_unet_tpu.plans.plans_handler import PlansManager
from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
from mlagg_unet_tpu.training.checkpoint import load_checkpoint
from mlagg_unet_tpu.training.registry import (
    get_network_builder,
    get_trainer_config,
)
from mlagg_unet_tpu.utils.helpers import (
    isdir,
    isfile,
    join,
    load_json,
    maybe_mkdir_p,
)


class NNUNetPredictor:
    def __init__(
        self,
        tile_step_size: float = 0.5,
        use_gaussian: bool = True,
        use_mirroring: bool = True,
        tile_batch_size: Optional[int] = None,  # None = HBM-budget auto
        verbose: bool = False,
        allow_tqdm: bool = False,
        compute_dtype="bfloat16",
    ):
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.tile_batch_size = tile_batch_size
        self.verbose = verbose
        import jax.numpy as jnp

        self.compute_dtype = (getattr(jnp, compute_dtype)
                              if isinstance(compute_dtype, str) and
                              compute_dtype else compute_dtype)

        self.network = None
        self.list_of_parameters: List = []
        self.plans_manager: Optional[PlansManager] = None
        self.configuration_manager = None
        self.dataset_json = None
        self.trainer_name = None
        self.allowed_mirroring_axes: Tuple[int, ...] = ()
        self.label_manager = None
        self._volume_predictors = None

    # ------------------------------------------------------------------
    def initialize_from_trained_model_folder(
        self, model_training_output_dir: str,
        use_folds: Union[Sequence[Union[int, str]], None],
        checkpoint_name: str = "checkpoint_final.ckpt",
    ):
        if use_folds is None:
            use_folds = self.auto_detect_available_folds(
                model_training_output_dir, checkpoint_name)
        dataset_json = load_json(join(model_training_output_dir,
                                      "dataset.json"))
        plans = load_json(join(model_training_output_dir, "plans.json"))
        plans_manager = PlansManager(plans)

        is_torch = checkpoint_name.endswith((".pth", ".pt"))
        parameters = []
        torch_state_dicts = []
        trainer_name = None
        mirroring = None
        configuration_name = None
        for f in use_folds:
            f = int(f) if f != "all" else f
            path = join(model_training_output_dir, f"fold_{f}",
                        checkpoint_name)
            if is_torch:
                # reference-format torch checkpoint
                # (predict_from_raw_data.py:83-99)
                import torch

                ckpt = torch.load(path, map_location="cpu",
                                  weights_only=False)
                torch_state_dicts.append(ckpt["network_weights"])
            else:
                ckpt = load_checkpoint(path)
            if trainer_name is None:
                trainer_name = ckpt["trainer_name"]
                configuration_name = ckpt["init_args"]["configuration"]
                mirroring = ckpt.get("inference_allowed_mirroring_axes") or ()
            if not is_torch:
                if ckpt.get("model_state"):
                    # BatchNorm-style nets: variables dict (running stats)
                    parameters.append({"params": ckpt["network_weights"],
                                       **ckpt["model_state"]})
                else:
                    parameters.append(ckpt["network_weights"])

        configuration_manager = plans_manager.get_configuration(
            configuration_name)
        num_input_channels = determine_num_input_channels(
            plans_manager, configuration_manager, dataset_json)
        cfg = get_trainer_config(trainer_name)
        label_manager = plans_manager.get_label_manager(dataset_json)
        network = get_network_builder(cfg.network)(
            configuration_manager, num_input_channels,
            label_manager.num_segmentation_heads, cfg.enable_deep_supervision,
        )

        if is_torch:
            # convert each fold with the family's verified rules
            from mlagg_unet_tpu.training.torch_import import (
                reference_state_dict_to_variables,
            )

            example_shape = (1, *configuration_manager.patch_size,
                             num_input_channels)
            for sd in torch_state_dicts:
                params, model_state = reference_state_dict_to_variables(
                    network, example_shape, sd, cfg.network)
                if model_state:
                    parameters.append({"params": params, **model_state})
                else:
                    parameters.append(params)

        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.network = network
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = tuple(mirroring or ())
        self.label_manager = label_manager

    def manual_initialization(self, network, plans_manager,
                              configuration_manager, parameters,
                              dataset_json, trainer_name,
                              inference_allowed_mirroring_axes):
        """reference :100-111 (used by trainer final validation)."""
        self.network = network
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = tuple(
            inference_allowed_mirroring_axes or ())
        self.label_manager = plans_manager.get_label_manager(dataset_json)

    @staticmethod
    def auto_detect_available_folds(model_dir: str, checkpoint_name: str
                                    ) -> List[int]:
        folds = []
        for f in os.listdir(model_dir):
            if f.startswith("fold_") and f != "fold_all" and \
                    isfile(join(model_dir, f, checkpoint_name)):
                folds.append(int(f.split("_")[-1]))
        assert folds, f"no usable folds in {model_dir}"
        return sorted(folds)

    # ------------------------------------------------------------------
    def _ensure_volume_predictors(self):
        if not hasattr(self, "_volume_predictors") or \
                self._volume_predictors is None:
            tile_size = self.configuration_manager.patch_size
            num_classes = self.label_manager.num_segmentation_heads
            mirror_axes = self.allowed_mirroring_axes \
                if self.use_mirroring else ()
            # 16-bit logits fetch when computing in bf16: the reference
            # ships HALF logits to the CPU (sliding_window_prediction.py
            # keeps predicted_logits torch.half through .cpu()); our
            # device-side gaussian accumulation stays fp32
            tdt = (jnp.bfloat16 if self.compute_dtype == jnp.bfloat16
                   else None)
            self._volume_predictors = [
                VolumePredictor(
                    self.network.apply, params, tile_size, num_classes,
                    mirror_axes, self.tile_batch_size, self.use_gaussian,
                    compute_dtype=self.compute_dtype,
                    transfer_dtype=tdt,
                )
                for params in self.list_of_parameters
            ]
        return self._volume_predictors

    def predict_logits_from_preprocessed_data(self, data: np.ndarray
                                              ) -> np.ndarray:
        """data: (c, *spatial) preprocessed. Averages logits over folds
        (reference :261-324)."""
        return self._finalize_device_logits(
            self._predict_logits_device(data))

    # -- device-pipelined variants (predict_from_files overlap) ----------
    def _predict_logits_device(self, data: np.ndarray):
        """Dispatch the full fold-averaged volume graph and start the
        device->host copy asynchronously, WITHOUT blocking. Fold logits
        are averaged on device (one transfer per volume, not per fold).
        Lets predict_from_files overlap volume k's fetch/export with
        volume k+1's compute (reference overlaps via background workers,
        predict_from_raw_data.py:211-254)."""
        vps = self._ensure_volume_predictors()
        acc = bounds = z_mode = None
        for vp in vps:
            logits, bounds, z_mode = vp._run(data)
            acc = logits if acc is None else acc + logits
        if len(vps) > 1:
            acc = acc / len(vps)
        if hasattr(acc, "copy_to_host_async"):
            acc.copy_to_host_async()
        return acc, bounds, z_mode

    def _finalize_device_logits(self, result) -> np.ndarray:
        """Fetch + unpad a _predict_logits_device result (blocks)."""
        return self._volume_predictors[0].finalize(result)

    def predict_single_npy_array(
        self, input_image: np.ndarray, image_properties: dict,
        segmentation_previous_stage: np.ndarray = None,
        output_file_truncated: str = None,
        save_or_return_probabilities: bool = False,
    ):
        """reference :354-436."""
        preprocessor = DefaultPreprocessor(verbose=self.verbose)
        data, seg, properties = preprocessor.run_case_npy(
            input_image, None, dict(image_properties), self.plans_manager,
            self.configuration_manager, self.dataset_json,
        )
        if segmentation_previous_stage is not None:
            data = self._stack_prev_stage(data, seg,
                                          segmentation_previous_stage,
                                          properties)
        logits = self.predict_logits_from_preprocessed_data(data)
        if output_file_truncated is not None:
            export_prediction_from_logits(
                logits, properties, self.configuration_manager,
                self.plans_manager, self.dataset_json, output_file_truncated,
                save_or_return_probabilities,
            )
            return None
        from mlagg_unet_tpu.inference.export import (
            convert_predicted_logits_to_segmentation_with_correct_shape,
        )

        return convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager,
            self.label_manager, properties,
            return_probabilities=save_or_return_probabilities,
        )

    def _stack_prev_stage(self, data, seg, prev_stage_seg, properties):
        """Cascade: resample prev-stage seg onto current grid and one-hot it
        (reference PreprocessAdapter :58-60)."""
        prev = self.configuration_manager.resampling_fn_seg(
            prev_stage_seg[None].astype(np.int8), data.shape[1:],
            self.configuration_manager.spacing,
            self.configuration_manager.spacing,
        )[0]
        onehot = convert_labelmap_to_one_hot(
            prev, self.label_manager.foreground_labels, data.dtype
        )
        return np.vstack([data, onehot])

    # ------------------------------------------------------------------
    def predict_from_files(
        self,
        list_of_lists_or_source_folder: Union[str, List[List[str]]],
        output_folder_or_list_of_truncated_output_files: Union[str, List[str]],
        save_probabilities: bool = False,
        overwrite: bool = True,
        num_parts: int = 1,
        part_id: int = 0,
        folder_with_segs_from_prev_stage: str = None,
    ):
        dataset_json = self.dataset_json
        file_ending = dataset_json["file_ending"]

        if isinstance(list_of_lists_or_source_folder, str):
            source = list_of_lists_or_source_folder
            identifiers = get_identifiers_from_splitted_dataset_folder(
                source, file_ending)
            lists = create_lists_from_splitted_dataset_folder(
                source, file_ending, identifiers)
        else:
            lists = list_of_lists_or_source_folder
            identifiers = [
                os.path.basename(l[0])[: -(len(file_ending) + 5)]
                for l in lists
            ]

        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            output_folder = output_folder_or_list_of_truncated_output_files
            maybe_mkdir_p(output_folder)
            out_truncated = [join(output_folder, i) for i in identifiers]
        else:
            out_truncated = output_folder_or_list_of_truncated_output_files
            output_folder = os.path.dirname(out_truncated[0]) \
                if out_truncated else "."

        # num_parts/part_id striping (reference :185-187)
        lists = lists[part_id::num_parts]
        out_truncated = out_truncated[part_id::num_parts]
        identifiers = identifiers[part_id::num_parts]

        # cascade: need previous stage segmentations
        prev_stage_name = self.configuration_manager.previous_stage_name
        if prev_stage_name is not None:
            assert folder_with_segs_from_prev_stage is not None, (
                "cascade configuration requires folder_with_segs_from_prev_stage"
            )

        rw = self.plans_manager.image_reader_writer_class()
        preprocessor = DefaultPreprocessor(verbose=self.verbose)

        def _load_and_preprocess(image_files, ident):
            """IO + preprocessing for one case (background worker).
            Mirrors the reference's background preprocessing
            (predict_from_raw_data.py:211-214); with host threads instead
            of spawn workers there is no pickling, so the reference's
            >2GB npy-spill workaround (:329-334) is unnecessary."""
            data, props = rw.read_images(image_files)
            seg_prev = None
            if prev_stage_name is not None:
                seg_prev, _ = rw.read_seg(
                    join(folder_with_segs_from_prev_stage,
                         ident + file_ending))
                seg_prev = seg_prev[0]
            pdata, pseg, pprops = preprocessor.run_case_npy(
                data, None, props, self.plans_manager,
                self.configuration_manager, self.dataset_json,
            )
            if seg_prev is not None:
                # resample prev seg to the preprocessed grid, stack one-hot
                prev_r = self.configuration_manager.resampling_fn_seg(
                    seg_prev[None].astype(np.int8), pdata.shape[1:],
                    props["spacing"], self.configuration_manager.spacing,
                )[0]
                onehot = convert_labelmap_to_one_hot(
                    prev_r, self.label_manager.foreground_labels, pdata.dtype)
                pdata = np.vstack([pdata, onehot])
            return pdata, pprops

        # Pipeline: preprocessing of case k+1..k+depth and export of finished
        # cases overlap the device predicting case k (reference
        # predict_from_raw_data.py:211-254, incl. the export busy-throttle
        # :231-254 that bounds pending exports).
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        todo = [(f, o, i) for f, o, i in zip(lists, out_truncated,
                                            identifiers)
                if overwrite or not isfile(o + file_ending)]
        n_pre = max(1, int(os.environ.get("MLAGG_PREPROCESS_WORKERS", "3")))
        n_exp = max(1, int(os.environ.get("MLAGG_EXPORT_WORKERS", "3")))
        from collections import deque

        with ThreadPoolExecutor(n_pre) as pre_pool, \
                ThreadPoolExecutor(n_exp) as exp_pool:
            # bounded prefetch: at most n_pre+1 preprocessed volumes in
            # flight so large datasets don't pile up in host memory
            pending = deque()
            next_i = 0
            while next_i < len(todo) and len(pending) <= n_pre:
                f, o, i = todo[next_i]
                pending.append((pre_pool.submit(_load_and_preprocess, f, i),
                                o))
                next_i += 1
            export_futs = []
            # 1-deep device pipeline: volume k's async device->host copy
            # and export run while volume k+1's tiles compute on-chip
            inflight = None  # (device result, pprops, out_trunc)

            def _drain_inflight():
                dev, pprops_, out_ = inflight
                logits = self._finalize_device_logits(dev)
                export_futs.append(exp_pool.submit(
                    export_prediction_from_logits,
                    logits, pprops_, self.configuration_manager,
                    self.plans_manager, self.dataset_json, out_,
                    save_probabilities,
                ))

            while pending:
                fut, out_trunc = pending.popleft()
                pdata, pprops = fut.result()
                if next_i < len(todo):
                    f, o, i = todo[next_i]
                    pending.append(
                        (pre_pool.submit(_load_and_preprocess, f, i), o))
                    next_i += 1
                dev = self._predict_logits_device(pdata)
                if inflight is not None:
                    _drain_inflight()
                inflight = (dev, pprops, out_trunc)
                # busy-throttle: keep at most 2*n_exp exports in flight
                while sum(not f.done() for f in export_futs) >= 2 * n_exp:
                    wait(export_futs, return_when=FIRST_COMPLETED)
            if inflight is not None:
                _drain_inflight()
            for f in export_futs:
                f.result()  # propagate worker exceptions
        return output_folder
