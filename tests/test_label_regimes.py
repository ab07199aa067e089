"""The reference's 4 integration-test label regimes (Dataset996-999):
plain labels (covered elsewhere), ignore label, regions, and the cascade
pipeline — each driven through preprocess -> train -> validate."""
import os
from dataclasses import replace as dc_replace

import numpy as np
import pytest


def _mk_env(tmp_path_factory, name):
    root = tmp_path_factory.mktemp(name)
    raw, pre, res = root / "raw", root / "pre", root / "res"
    for d in (raw, pre, res):
        d.mkdir()
    from mlagg_unet_tpu import paths

    paths.nnUNet_raw = str(raw)
    paths.nnUNet_preprocessed = str(pre)
    paths.nnUNet_results = str(res)
    return str(raw), str(pre), str(res)


def _shrink_plans(pre, ds, cfgs=("3d_fullres",)):
    from mlagg_unet_tpu.utils.helpers import join, load_json, save_json

    pf = join(pre, ds, "nnUNetPlans.json")
    plans = load_json(pf)
    for c in cfgs:
        if c not in plans["configurations"]:
            continue
        cfg = plans["configurations"][c]
        if "patch_size" not in cfg:
            continue  # cascade inherits
        dim = len(cfg["patch_size"])
        cfg.update({
            "patch_size": [16] * dim, "batch_size": 2,
            "pool_op_kernel_sizes": [[1] * dim, [2] * dim],
            "conv_kernel_sizes": [[3] * dim] * 2,
            "n_conv_per_stage_encoder": [1, 1],
            "n_conv_per_stage_decoder": [1],
            "num_pool_per_axis": [1] * dim,
            "UNet_base_num_features": 4,
        })
    save_json(plans, pf, sort_keys=False)
    return plans


def _tiny_trainer_cfg(name):
    from mlagg_unet_tpu.training import registry as reg

    reg.TRAINER_REGISTRY[name] = dc_replace(
        reg.TRAINER_REGISTRY["nnUNetTrainer_1epochs"], name=name,
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    return name


def test_ignore_label_training(tmp_path_factory):
    raw, pre, res = _mk_env(tmp_path_factory, "ignore")
    from mlagg_unet_tpu.utils.synthetic_data import generate_synthetic_dataset
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU
    from mlagg_unet_tpu.utils.helpers import join, load_json

    generate_synthetic_dataset(raw, "Dataset998_Ig", num_train=5, num_test=0,
                               shape=(14, 20, 18), with_ignore_label=True,
                               seed=5)
    DatasetFingerprintExtractor("Dataset998_Ig", num_processes=1).run()
    ExperimentPlanner("Dataset998_Ig").plan_experiment()
    plans = _shrink_plans(pre, "Dataset998_Ig")
    DefaultPreprocessor().run("Dataset998_Ig", "3d_fullres", num_processes=1)

    dataset_json = load_json(join(pre, "Dataset998_Ig", "dataset.json"))
    assert "ignore" in dataset_json["labels"]
    t = NNUNetTrainerTPU(plans, "3d_fullres", 0, dataset_json,
                         trainer_name=_tiny_trainer_cfg("_tiny_ig"))
    assert t.label_manager.has_ignore_label
    t.run_training()
    lg = t.logger.my_fantastic_logging
    assert np.isfinite(lg["train_losses"][0])


def test_regions_training(tmp_path_factory):
    raw, pre, res = _mk_env(tmp_path_factory, "regions")
    from mlagg_unet_tpu.utils.synthetic_data import generate_synthetic_dataset
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU
    from mlagg_unet_tpu.utils.helpers import join, load_json

    generate_synthetic_dataset(raw, "Dataset997_Rg", num_train=5, num_test=0,
                               shape=(14, 20, 18), with_regions=True, seed=6)
    DatasetFingerprintExtractor("Dataset997_Rg", num_processes=1).run()
    ExperimentPlanner("Dataset997_Rg").plan_experiment()
    plans = _shrink_plans(pre, "Dataset997_Rg")
    DefaultPreprocessor().run("Dataset997_Rg", "3d_fullres", num_processes=1)

    dataset_json = load_json(join(pre, "Dataset997_Rg", "dataset.json"))
    t = NNUNetTrainerTPU(plans, "3d_fullres", 0, dataset_json,
                         trainer_name=_tiny_trainer_cfg("_tiny_rg"))
    assert t.label_manager.has_regions
    assert t.label_manager.num_segmentation_heads == 2
    t.run_training()
    t.perform_actual_validation()
    val = join(t.output_folder, "validation")
    assert os.path.isfile(join(val, "summary.json"))


def test_cascade_pipeline(tmp_path_factory):
    """3d_lowres train + validate (exports next-stage) -> cascade train."""
    raw, pre, res = _mk_env(tmp_path_factory, "cascade")
    from mlagg_unet_tpu.utils.synthetic_data import generate_synthetic_dataset
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU
    from mlagg_unet_tpu.utils.helpers import join, load_json, save_json

    generate_synthetic_dataset(raw, "Dataset996_Ca", num_train=5, num_test=0,
                               shape=(14, 20, 18), seed=9)
    DatasetFingerprintExtractor("Dataset996_Ca", num_processes=1).run()
    ExperimentPlanner("Dataset996_Ca").plan_experiment()

    # force a lowres + cascade config (reference add_lowres_and_cascade.py)
    pf = join(pre, "Dataset996_Ca", "nnUNetPlans.json")
    plans = load_json(pf)
    fullres = dict(plans["configurations"]["3d_fullres"])
    plans["configurations"]["3d_lowres"] = {
        **fullres,
        "data_identifier": "nnUNetPlans_3d_lowres",
        "spacing": [s * 1.5 for s in fullres["spacing"]],
        "batch_dice": False,
        "next_stage": "3d_cascade_fullres",
    }
    plans["configurations"]["3d_cascade_fullres"] = {
        "inherits_from": "3d_fullres",
        "previous_stage": "3d_lowres",
    }
    save_json(plans, pf, sort_keys=False)
    plans = _shrink_plans(pre, "Dataset996_Ca",
                          cfgs=("3d_fullres", "3d_lowres"))
    DefaultPreprocessor().run("Dataset996_Ca", "3d_lowres", num_processes=1)
    DefaultPreprocessor().run("Dataset996_Ca", "3d_fullres", num_processes=1)

    dataset_json = load_json(join(pre, "Dataset996_Ca", "dataset.json"))
    name = _tiny_trainer_cfg("_tiny_ca")

    t_low = NNUNetTrainerTPU(plans, "3d_lowres", 0, dataset_json,
                             trainer_name=name)
    t_low.run_training()
    t_low.perform_actual_validation()
    next_stage_dir = join(t_low.output_folder_base, "predicted_next_stage",
                          "3d_cascade_fullres")
    assert os.path.isdir(next_stage_dir)
    assert len(os.listdir(next_stage_dir)) == 1  # the val case

    # cascade training needs prev-stage segs for every case, each with the
    # fullres case's own spatial shape; fabricate them for the toy test
    from mlagg_unet_tpu.data.dataset import get_case_identifiers, nnUNetDataset

    full_ds = nnUNetDataset(join(pre, "Dataset996_Ca",
                                 "nnUNetPlans_3d_fullres"))
    rng = np.random.RandomState(0)
    for ident in get_case_identifiers(
            join(pre, "Dataset996_Ca", "nnUNetPlans_3d_fullres")):
        tgt = join(next_stage_dir, ident + ".npz")
        if not os.path.isfile(tgt):
            d, _, _ = full_ds.load_case(ident)
            fake = rng.randint(0, 3, d.shape[1:]).astype(np.int8)
            np.savez_compressed(tgt, seg=fake[None])

    t_cas = NNUNetTrainerTPU(plans, "3d_cascade_fullres", 0, dataset_json,
                             trainer_name=name)
    assert t_cas.num_input_channels == 1 + 2  # image + 2 fg one-hot
    t_cas.run_training()
    assert np.isfinite(t_cas.logger.my_fantastic_logging["train_losses"][0])
