"""CLI entry points (reference: mlagg/setup.py:45-68 console scripts +
the argparse entrypoints scattered through the reference modules).

Same verb set as the reference (plan_and_preprocess, train, predict,
evaluate, ensemble, postprocessing, find_best_configuration, model sharing),
mlaggtpu_-prefixed. Also invocable as
`python -m mlagg_unet_tpu.cli.entrypoints <verb> ...`.
"""
from __future__ import annotations

import argparse
import sys

from mlagg_unet_tpu import paths
from mlagg_unet_tpu.utils.helpers import (
    join,
    load_json,
    maybe_convert_to_dataset_name,
    maybe_mkdir_p,
)


def extract_fingerprint_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_extract_fingerprint")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    a = p.parse_args(args)
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor

    for d in a.d:
        if a.verify_dataset_integrity:
            from mlagg_unet_tpu.cli.verify_dataset_integrity import (
                verify_dataset_integrity,
            )

            verify_dataset_integrity(
                join(paths.nnUNet_raw, maybe_convert_to_dataset_name(d)))
        DatasetFingerprintExtractor(d, num_processes=a.np).run(
            overwrite_existing=True)


def plan_experiment_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_plan_experiment")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-gpu_memory_target", type=float, default=8)
    p.add_argument("-overwrite_plans_name", default="nnUNetPlans")
    a = p.parse_args(args)
    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner

    for d in a.d:
        ExperimentPlanner(d, gpu_memory_target_in_gb=a.gpu_memory_target,
                          plans_name=a.overwrite_plans_name).plan_experiment()


def preprocess_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_preprocess")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-np", type=int, default=8)
    p.add_argument("-plans_name", default="nnUNetPlans")
    a = p.parse_args(args)
    from mlagg_unet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from mlagg_unet_tpu.plans.plans_handler import PlansManager

    for d in a.d:
        dataset_name = maybe_convert_to_dataset_name(d)
        plans_file = join(paths.nnUNet_preprocessed, dataset_name,
                          a.plans_name + ".json")
        pm = PlansManager(plans_file)
        for c in a.c:
            if c not in pm.available_configurations:
                print(f"skipping configuration {c} (not in plans)")
                continue
            DefaultPreprocessor().run(d, c, a.plans_name, num_processes=a.np)


def plan_and_preprocess_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_plan_and_preprocess")
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    a = p.parse_args(args)
    fp_args = ["-d", *a.d, "-np", str(a.np)]
    if a.verify_dataset_integrity:
        fp_args.append("--verify_dataset_integrity")
    extract_fingerprint_entry(fp_args)
    plan_experiment_entry(["-d", *a.d])
    preprocess_entry(["-d", *a.d, "-c", *a.c, "-np", str(a.np)])


def train_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_train")
    p.add_argument("dataset_name_or_id")
    p.add_argument("configuration")
    p.add_argument("fold", help="0-4 or 'all'")
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("--c", action="store_true", help="continue training")
    p.add_argument("--npz", action="store_true",
                   help="save softmax of validation predictions")
    p.add_argument("--val", action="store_true", help="only run validation")
    p.add_argument("-num_devices", type=int, default=None)
    p.add_argument("-pretrained_weights", default=None,
                   help="checkpoint to transfer name/shape-matched weights from")
    a = p.parse_args(args)

    from mlagg_unet_tpu.training.trainer import NNUNetTrainerTPU

    dataset_name = maybe_convert_to_dataset_name(a.dataset_name_or_id)
    plans = load_json(join(paths.nnUNet_preprocessed, dataset_name,
                           a.p + ".json"))
    dataset_json = load_json(join(paths.nnUNet_preprocessed, dataset_name,
                                  "dataset.json"))
    fold = a.fold if a.fold == "all" else int(a.fold)
    trainer = NNUNetTrainerTPU(plans, a.configuration, fold, dataset_json,
                               trainer_name=a.tr, num_devices=a.num_devices)

    # stage plans/dataset json next to results for the predictor
    maybe_mkdir_p(trainer.output_folder_base)
    from mlagg_unet_tpu.utils.helpers import save_json

    save_json(plans, join(trainer.output_folder_base, "plans.json"),
              sort_keys=False)
    save_json(dataset_json, join(trainer.output_folder_base, "dataset.json"),
              sort_keys=False)

    if not a.val:
        if a.pretrained_weights:
            trainer.initialize()
            if a.pretrained_weights.endswith((".pth", ".pt")):
                # reference torch checkpoints (torch.save state dicts)
                from mlagg_unet_tpu.training.torch_import import (
                    load_pretrained_torch_weights,
                )

                trainer.params, n_tr, n_tot = load_pretrained_torch_weights(
                    trainer.params, a.pretrained_weights)
            else:
                from mlagg_unet_tpu.training.load_pretrained_weights import (
                    load_pretrained_weights,
                )

                trainer.params, n_tr, n_tot = load_pretrained_weights(
                    trainer.params, a.pretrained_weights)
            print(f"transferred {n_tr}/{n_tot} parameter tensors")
        if a.c:
            from mlagg_unet_tpu.utils.helpers import isfile

            for name in ("checkpoint_final.ckpt", "checkpoint_latest.ckpt",
                         "checkpoint_best.ckpt"):
                f = join(trainer.output_folder, name)
                if isfile(f):
                    trainer.initialize()
                    trainer.load_checkpoint_file(f)
                    break
        trainer.run_training()
    trainer.perform_actual_validation(save_probabilities=a.npz)


def predict_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_predict")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-d", required=True)
    p.add_argument("-c", required=True)
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", default=None)
    p.add_argument("-chk", default="checkpoint_final.ckpt")
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("-num_parts", type=int, default=1)
    p.add_argument("-part_id", type=int, default=0)
    p.add_argument("-prev_stage_predictions", default=None)
    a = p.parse_args(args)

    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor

    dataset_name = maybe_convert_to_dataset_name(a.d)
    model_dir = join(paths.nnUNet_results, dataset_name,
                     f"{a.tr}__{a.p}__{a.c}")
    predictor = NNUNetPredictor(tile_step_size=a.step_size,
                                use_mirroring=not a.disable_tta)
    predictor.initialize_from_trained_model_folder(
        model_dir, a.f, checkpoint_name=a.chk)
    predictor.predict_from_files(
        a.i, a.o, save_probabilities=a.save_probabilities,
        num_parts=a.num_parts, part_id=a.part_id,
        folder_with_segs_from_prev_stage=a.prev_stage_predictions,
    )


def evaluate_folder_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_evaluate_folder")
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-djfile", required=True, help="dataset.json")
    p.add_argument("-pfile", required=True, help="plans.json")
    p.add_argument("-o", default=None)
    a = p.parse_args(args)

    from mlagg_unet_tpu.evaluation.metrics import compute_metrics_on_folder
    from mlagg_unet_tpu.plans.plans_handler import PlansManager

    dataset_json = load_json(a.djfile)
    pm = PlansManager(load_json(a.pfile))
    lm = pm.get_label_manager(dataset_json)
    rw = pm.image_reader_writer_class()
    out = a.o or join(a.pred_folder, "summary.json")
    labels_or_regions = (lm.foreground_regions if lm.has_regions
                         else lm.foreground_labels)
    result = compute_metrics_on_folder(
        a.gt_folder, a.pred_folder, out, rw, dataset_json["file_ending"],
        labels_or_regions, lm.ignore_label,
    )
    print("mean foreground Dice:", result["foreground_mean"]["Dice"])


def ensemble_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_ensemble")
    p.add_argument("-i", nargs="+", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.ensembling import ensemble_folders

    ensemble_folders(a.i, a.o, num_processes=a.np)


def apply_postprocessing_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_apply_postprocessing")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-pp_pkl_file", required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("-plans_json", default=None)
    p.add_argument("-dataset_json", default=None)
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.remove_connected_components import (
        apply_postprocessing_to_folder,
    )

    apply_postprocessing_to_folder(a.i, a.o, a.pp_pkl_file,
                                   plans_json=a.plans_json,
                                   dataset_json=a.dataset_json,
                                   num_processes=a.np)


def find_best_configuration_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_find_best_configuration")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-p", nargs="+", default=["nnUNetPlans"])
    p.add_argument("-c", nargs="+",
                   default=["2d", "3d_fullres", "3d_lowres",
                            "3d_cascade_fullres"])
    p.add_argument("-tr", nargs="+", default=["nnUNetTrainer"])
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("--disable_ensembling", action="store_true")
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.find_best_configuration import (
        dumb_trainer_config_plans_to_trained_models_dict,
        find_best_configuration,
    )

    models = dumb_trainer_config_plans_to_trained_models_dict(a.tr, a.c, a.p)
    find_best_configuration(a.dataset_name_or_id, models, allow_ensembling=not
                            a.disable_ensembling, folds=tuple(a.f))


def accumulate_crossval_results_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_accumulate_crossval_results")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-c", required=True)
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("-o", default=None)
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.find_best_configuration import (
        accumulate_cv_results,
    )
    from mlagg_unet_tpu.utils.helpers import get_output_folder

    dataset_name = maybe_convert_to_dataset_name(a.dataset_name_or_id)
    trained_model_folder = get_output_folder(dataset_name, a.tr, a.p, a.c)
    out = a.o or join(trained_model_folder, "crossval_results_folds_"
                      + "_".join(str(i) for i in a.f))
    accumulate_cv_results(trained_model_folder, out, tuple(a.f))


def export_model_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_export_model_to_zip")
    p.add_argument("-d", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-c", nargs="+", required=True)
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", default=(0, 1, 2, 3, 4))
    p.add_argument("-chk", nargs="+", default=("checkpoint_final.ckpt",))
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.model_sharing import (
        export_pretrained_model,
    )

    export_pretrained_model(a.d, a.o, a.c, a.tr, a.p, tuple(a.f),
                            tuple(a.chk))


def predict_from_modelfolder_entry(args=None):
    """reference predict_from_raw_data.py:354 — predict with an explicit
    model folder instead of nnUNet_results lookup."""
    p = argparse.ArgumentParser("mlaggtpu_predict_from_modelfolder")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-m", required=True, help="trained model folder "
                   "(contains fold_X subfolders)")
    p.add_argument("-f", nargs="+", default=None)
    p.add_argument("-chk", default="checkpoint_final.ckpt")
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", "--c", action="store_true",
                   dest="continue_prediction")
    p.add_argument("-num_parts", type=int, default=1)
    p.add_argument("-part_id", type=int, default=0)
    p.add_argument("-prev_stage_predictions", default=None)
    a = p.parse_args(args)

    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor

    predictor = NNUNetPredictor(tile_step_size=a.step_size,
                                use_mirroring=not a.disable_tta)
    predictor.initialize_from_trained_model_folder(
        a.m, a.f, checkpoint_name=a.chk)
    predictor.predict_from_files(
        a.i, a.o, save_probabilities=a.save_probabilities,
        overwrite=not a.continue_prediction,
        num_parts=a.num_parts, part_id=a.part_id,
        folder_with_segs_from_prev_stage=a.prev_stage_predictions,
    )


def determine_postprocessing_entry(args=None):
    """reference remove_connected_components.py:298 — writes
    postprocessing.pkl/json into the input folder."""
    p = argparse.ArgumentParser("mlaggtpu_determine_postprocessing")
    p.add_argument("-i", required=True, help="folder with predictions")
    p.add_argument("-ref", required=True, help="folder with gt labels")
    p.add_argument("-plans_json", default=None)
    p.add_argument("-dataset_json", default=None)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--remove_postprocessed", action="store_true")
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.remove_connected_components import (
        determine_postprocessing,
    )

    plans = a.plans_json or join(a.i, "plans.json")
    dsj = a.dataset_json or join(a.i, "dataset.json")
    determine_postprocessing(a.i, a.ref, plans, dsj, num_processes=a.np,
                             keep_postprocessed_files=not
                             a.remove_postprocessed)


def evaluate_simple_entry(args=None):
    """reference evaluate_predictions.py:235 — evaluate without plans/
    dataset json, labels given explicitly."""
    p = argparse.ArgumentParser("mlaggtpu_evaluate_simple")
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-l", type=int, nargs="+", required=True)
    p.add_argument("-il", type=int, default=None, help="ignore label")
    p.add_argument("-o", default=None)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(args)
    from mlagg_unet_tpu.evaluation.metrics import (
        compute_metrics_on_folder_simple,
    )

    out = a.o or join(a.pred_folder, "summary.json")
    result = compute_metrics_on_folder_simple(
        a.gt_folder, a.pred_folder, a.l, output_file=out,
        num_processes=a.np, ignore_label=a.il)
    print("mean foreground Dice:", result["foreground_mean"]["Dice"])


def move_plans_between_datasets_entry(args=None):
    """reference move_plans_between_datasets.py:58."""
    p = argparse.ArgumentParser("mlaggtpu_move_plans_between_datasets")
    p.add_argument("-s", required=True, help="source dataset name or id")
    p.add_argument("-t", required=True, help="target dataset name or id")
    p.add_argument("-sp", required=True, help="source plans identifier")
    p.add_argument("-tp", default=None, help="target plans identifier")
    a = p.parse_args(args)
    from mlagg_unet_tpu.plans.move_plans import move_plans_between_datasets

    out = move_plans_between_datasets(a.s, a.t, a.sp, a.tp)
    print("wrote", out)


def plot_overlay_pngs_entry(args=None):
    """reference overlay_plots.py:242."""
    p = argparse.ArgumentParser("mlaggtpu_plot_overlay_pngs")
    p.add_argument("-d", required=True, help="dataset name or id")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(args)
    from mlagg_unet_tpu.utils.overlay_plots import (
        generate_overlays_for_dataset,
    )

    generate_overlays_for_dataset(a.d, a.o, num_processes=a.np)


def download_model_entry(args=None):
    """reference model_sharing/entry_points.py download_by_url."""
    p = argparse.ArgumentParser("mlaggtpu_download_pretrained_model_by_url")
    p.add_argument("url")
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.model_sharing import (
        download_and_install_pretrained_model,
    )

    download_and_install_pretrained_model(a.url)


def convert_old_nnunet_dataset_entry(args=None):
    """reference convert_raw_dataset_from_old_nnunet_format.py:43."""
    p = argparse.ArgumentParser("mlaggtpu_convert_old_nnUNet_dataset")
    p.add_argument("input_folder", help="old TaskXXX_NAME folder path")
    p.add_argument("output_dataset_name", help="DatasetXXX_NAME (name, "
                   "not path)")
    a = p.parse_args(args)
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_old_nnunet_dataset,
    )

    out = convert_old_nnunet_dataset(a.input_folder, a.output_dataset_name)
    print("wrote", out)


def convert_msd_dataset_entry(args=None):
    """reference convert_MSD_dataset.py:117."""
    p = argparse.ArgumentParser("mlaggtpu_convert_MSD_dataset")
    p.add_argument("-i", required=True, help="extracted MSD task folder")
    p.add_argument("-overwrite_id", type=int, default=None)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(args)
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_msd_dataset,
    )

    out = convert_msd_dataset(a.i, a.overwrite_id)
    print("wrote", out)


def install_model_entry(args=None):
    p = argparse.ArgumentParser("mlaggtpu_install_pretrained_model_from_zip")
    p.add_argument("zip_file")
    a = p.parse_args(args)
    from mlagg_unet_tpu.postprocessing.model_sharing import (
        install_model_from_zip_file,
    )

    install_model_from_zip_file(a.zip_file)


_VERBS = {
    "plan_and_preprocess": plan_and_preprocess_entry,
    "extract_fingerprint": extract_fingerprint_entry,
    "plan_experiment": plan_experiment_entry,
    "preprocess": preprocess_entry,
    "train": train_entry,
    "predict": predict_entry,
    "predict_from_modelfolder": predict_from_modelfolder_entry,
    "evaluate_folder": evaluate_folder_entry,
    "evaluate_simple": evaluate_simple_entry,
    "ensemble": ensemble_entry,
    "determine_postprocessing": determine_postprocessing_entry,
    "apply_postprocessing": apply_postprocessing_entry,
    "find_best_configuration": find_best_configuration_entry,
    "accumulate_crossval_results": accumulate_crossval_results_entry,
    "move_plans_between_datasets": move_plans_between_datasets_entry,
    "plot_overlay_pngs": plot_overlay_pngs_entry,
    "export_model": export_model_entry,
    "install_model": install_model_entry,
    "download_pretrained_model_by_url": download_model_entry,
    "convert_old_nnUNet_dataset": convert_old_nnunet_dataset_entry,
    "convert_MSD_dataset": convert_msd_dataset_entry,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in _VERBS:
        print(f"usage: python -m mlagg_unet_tpu.cli.entrypoints "
              f"{{{','.join(_VERBS)}}} ...")
        sys.exit(1)
    verb = sys.argv[1]
    _VERBS[verb](sys.argv[2:])


if __name__ == "__main__":
    main()
