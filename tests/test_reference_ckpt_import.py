"""Accuracy-parity readiness drill (VERDICT r2 item 7): a reference-format
torch checkpoint folder (fold_X/checkpoint_final.pth with the dict layout
of nnUNetTrainer.save_checkpoint, reference nnUNetTrainer.py:1007-1021)
is consumed directly by NNUNetPredictor.initialize_from_trained_model_folder
-> predict_from_files -> evaluate_folder with exact-NSD tolerances,
proving the day-datasets-arrive path end to end
(predict_from_raw_data.py:83-99 checkpoint-rebuild contract).

The torch net is the reference's own UMambaBot source (executed via
tests/reference_torch.py) built from the same tiny plan the flax builder
uses, so the weights flowing through the converter are genuine
reference-format tensors.
"""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("refckpt")
    raw, pre, res = root / "raw", root / "pre", root / "res"
    for d in (raw, pre, res):
        d.mkdir()
    from mlagg_unet_tpu import paths

    paths.nnUNet_raw = str(raw)
    paths.nnUNet_preprocessed = str(pre)
    paths.nnUNet_results = str(res)

    from mlagg_unet_tpu.plans.experiment_planner import ExperimentPlanner
    from mlagg_unet_tpu.plans.fingerprint import DatasetFingerprintExtractor
    from mlagg_unet_tpu.utils.helpers import join, load_json, save_json
    from mlagg_unet_tpu.utils.synthetic_data import (
        generate_synthetic_dataset,
    )

    generate_synthetic_dataset(str(raw), "Dataset996_RC", num_train=3,
                               num_test=0, shape=(16, 24, 20), seed=11)
    DatasetFingerprintExtractor("Dataset996_RC", num_processes=1).run()
    ExperimentPlanner("Dataset996_RC").plan_experiment()
    plans_file = join(str(pre), "Dataset996_RC", "nnUNetPlans.json")
    plans = load_json(plans_file)
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    cfg["batch_size"] = 2
    cfg["pool_op_kernel_sizes"] = [[1, 1, 1], [2, 2, 2]]
    cfg["conv_kernel_sizes"] = [[3, 3, 3], [3, 3, 3]]
    cfg["n_conv_per_stage_encoder"] = [1, 1]
    cfg["n_conv_per_stage_decoder"] = [1]
    cfg["num_pool_per_axis"] = [1, 1, 1]
    cfg["UNet_base_num_features"] = 8
    save_json(plans, plans_file, sort_keys=False)
    return {"raw": str(raw), "pre": str(pre), "res": str(res),
            "plans": plans}


def _build_reference_torch_umamba(plans, num_input_channels, num_classes):
    """Reference UMambaBot_3d built exactly as the flax builder maps the
    plan (models/umamba.py umamba_from_plans)."""
    import torch
    import torch.nn as nn

    from tests import reference_torch as rt

    cfg = plans["configurations"]["3d_fullres"]
    n_stages = len(cfg["pool_op_kernel_sizes"])
    base = cfg["UNet_base_num_features"]
    features = [min(base * 2 ** i, 320) for i in range(n_stages)]
    m = rt.load_reference_umamba("bot_3d")
    torch.manual_seed(0)
    return m.UMambaBot(
        input_channels=num_input_channels, n_stages=n_stages,
        features_per_stage=features, conv_op=nn.Conv3d,
        kernel_sizes=[tuple(k) for k in cfg["conv_kernel_sizes"]],
        strides=[tuple(s) for s in cfg["pool_op_kernel_sizes"]],
        n_conv_per_stage=list(cfg["n_conv_per_stage_encoder"]),
        num_classes=num_classes,
        n_conv_per_stage_decoder=list(cfg["n_conv_per_stage_decoder"]),
        conv_bias=True, norm_op=nn.InstanceNorm3d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"inplace": True},
        deep_supervision=True,
    )


@pytest.fixture(scope="module")
def reference_model_folder(env):
    """Stage a reference-format results folder: plans.json, dataset.json,
    fold_0/checkpoint_final.pth (torch.save of the reference dict)."""
    import torch

    from mlagg_unet_tpu.utils.helpers import (
        join,
        load_json,
        maybe_mkdir_p,
        save_json,
    )

    dataset_json = load_json(join(env["pre"], "Dataset996_RC",
                                  "dataset.json"))
    num_classes = len(dataset_json["labels"])
    num_input_channels = len(dataset_json["channel_names"])
    net = _build_reference_torch_umamba(env["plans"], num_input_channels,
                                        num_classes)
    net.eval()

    folder = join(env["res"], "Dataset996_RC",
                  "nnUNetTrainerUMambaBot__nnUNetPlans__3d_fullres")
    maybe_mkdir_p(join(folder, "fold_0"))
    save_json(env["plans"], join(folder, "plans.json"), sort_keys=False)
    save_json(dataset_json, join(folder, "dataset.json"), sort_keys=False)
    checkpoint = {
        "network_weights": net.state_dict(),
        "optimizer_state": None,
        "grad_scaler_state": None,
        "logging": {},
        "_best_ema": None,
        "current_epoch": 1,
        "init_args": {"configuration": "3d_fullres"},
        "trainer_name": "nnUNetTrainerUMambaBot",
        "inference_allowed_mirroring_axes": (0, 1, 2),
    }
    torch.save(checkpoint, join(folder, "fold_0", "checkpoint_final.pth"))
    return {"folder": folder, "net": net,
            "dataset_json": dataset_json}


def test_pth_folder_predict_and_evaluate(env, reference_model_folder,
                                         tmp_path):
    """.pth folder -> converted predictor -> nii.gz segs -> exact-NSD
    evaluation. CLI equivalent:
      mlagg_predict -i <inDir> -o <outDir> -m <torchResultsFolder> \
          -f 0 -chk checkpoint_final.pth
      mlagg_evaluate_folder <gt> <outDir> -l 1 2 ...
    """
    from mlagg_unet_tpu.evaluation.benchmark_eval import evaluate_folder
    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor
    from mlagg_unet_tpu.utils.helpers import join

    predictor = NNUNetPredictor(tile_batch_size=2)
    predictor.initialize_from_trained_model_folder(
        reference_model_folder["folder"], use_folds=[0],
        checkpoint_name="checkpoint_final.pth",
    )
    assert predictor.trainer_name == "nnUNetTrainerUMambaBot"
    assert predictor.allowed_mirroring_axes == (0, 1, 2)

    out = str(tmp_path / "preds")
    predictor.predict_from_files(
        join(env["raw"], "Dataset996_RC", "imagesTr"), out)
    segs = sorted(f for f in os.listdir(out) if f.endswith(".nii.gz"))
    assert len(segs) == 3

    labels = [int(v) for v in
              reference_model_folder["dataset_json"]["labels"].values()
              if int(v) != 0]
    summary = evaluate_folder(
        join(env["raw"], "Dataset996_RC", "labelsTr"), out, labels,
        tolerances={l: 1.0 for l in labels},
        csv_out=str(tmp_path / "eval.csv"))
    for l in labels:
        assert f"mean_dsc_{l}" in summary
        assert f"mean_nsd_{l}" in summary
    assert os.path.isfile(tmp_path / "eval.csv")


def test_pth_logits_match_reference_torch(env, reference_model_folder):
    """The converted predictor's network reproduces the reference torch
    forward on a raw patch — the import is weight-exact, not just
    shape-compatible."""
    import jax.numpy as jnp
    import torch

    from mlagg_unet_tpu.inference.predictor import NNUNetPredictor

    predictor = NNUNetPredictor(tile_batch_size=2)
    predictor.initialize_from_trained_model_folder(
        reference_model_folder["folder"], use_folds=[0],
        checkpoint_name="checkpoint_final.pth",
    )
    net = reference_model_folder["net"]
    x_np = np.random.RandomState(3).randn(1, 16, 16, 16, 1).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3))))
    ref_np = np.transpose(ref[0].numpy(), (0, 2, 3, 4, 1))
    got = np.asarray(predictor.network.apply(
        {"params": predictor.list_of_parameters[0]}, jnp.asarray(x_np))[0],
        np.float32)
    rel = np.abs(got - ref_np).max() / (np.abs(ref_np).max() + 1e-8)
    assert rel < 2e-3, f"imported-checkpoint forward rel err {rel}"


def test_prediction_verbs_functional(env, reference_model_folder, tmp_path):
    """VERDICT r2 item 8: predict_from_modelfolder / evaluate_simple /
    determine_postprocessing exercised as CLI verbs against a real model
    folder, checking artifacts (not just --help)."""
    from mlagg_unet_tpu.cli.entrypoints import _VERBS
    from mlagg_unet_tpu.utils.helpers import join, load_json

    out = str(tmp_path / "verb_preds")
    _VERBS["predict_from_modelfolder"]([
        "-i", join(env["raw"], "Dataset996_RC", "imagesTr"),
        "-o", out, "-m", reference_model_folder["folder"],
        "-f", "0", "-chk", "checkpoint_final.pth", "--disable_tta",
    ])
    segs = sorted(f for f in os.listdir(out) if f.endswith(".nii.gz"))
    assert len(segs) == 3

    labels = [int(v) for v in
              reference_model_folder["dataset_json"]["labels"].values()
              if int(v) != 0]
    summary_file = str(tmp_path / "summary.json")
    _VERBS["evaluate_simple"]([
        join(env["raw"], "Dataset996_RC", "labelsTr"), out,
        "-l", *[str(l) for l in labels], "-o", summary_file, "-np", "1",
    ])
    summary = load_json(summary_file)
    assert "foreground_mean" in summary and "Dice" in \
        summary["foreground_mean"]

    _VERBS["determine_postprocessing"]([
        "-i", out, "-ref", join(env["raw"], "Dataset996_RC", "labelsTr"),
        "-plans_json", join(reference_model_folder["folder"], "plans.json"),
        "-dataset_json", join(reference_model_folder["folder"],
                              "dataset.json"),
        "-np", "1",
    ])
    assert os.path.isfile(join(out, "postprocessing.pkl"))
    assert os.path.isfile(join(out, "postprocessing.json"))
