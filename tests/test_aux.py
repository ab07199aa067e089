"""Auxiliary subsystems: overlays, benchmark eval CSV, dataset.json
generation, converters, LR schedules, model sharing."""
import os

import numpy as np
import pytest


def test_generate_dataset_json(tmp_path):
    from mlagg_unet_tpu.dataset_conversion.generate_dataset_json import (
        generate_dataset_json,
    )
    from mlagg_unet_tpu.utils.helpers import load_json

    generate_dataset_json(
        str(tmp_path), {0: "CT"}, {"background": 0, "organ": 1}, 10, ".nii.gz",
        dataset_name="Test",
    )
    dj = load_json(str(tmp_path / "dataset.json"))
    assert dj["numTraining"] == 10
    assert dj["channel_names"] == {"0": "CT"}

    # region labels require regions_class_order
    with pytest.raises(AssertionError):
        generate_dataset_json(
            str(tmp_path), {0: "CT"},
            {"background": 0, "whole": [1, 2]}, 10, ".nii.gz",
        )


def test_overlay(rng):
    from mlagg_unet_tpu.utils.overlay_plots import generate_overlay

    img = rng.rand(32, 32).astype(np.float32)
    seg = np.zeros((32, 32), np.uint8)
    seg[8:16, 8:16] = 1
    ov = generate_overlay(img, seg)
    assert ov.shape == (32, 32, 3)
    assert ov.dtype == np.uint8
    # overlay region differs from grayscale base
    assert not np.all(ov[10, 10, 0] == ov[10, 10, 2])


def test_benchmark_eval(tmp_path, rng):
    from mlagg_unet_tpu.evaluation.benchmark_eval import evaluate_folder
    from mlagg_unet_tpu.imageio.nifti_io import write_nifti

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    for i in range(2):
        seg = np.zeros((16, 16, 16), np.uint8)
        seg[4:12, 4:12, 4:12] = 1
        pred = np.roll(seg, 1, axis=0)
        write_nifti(str(gt_dir / f"case{i}.nii.gz"), seg, (1, 1, 1))
        write_nifti(str(pred_dir / f"case{i}.nii.gz"), pred, (1, 1, 1))
    summary = evaluate_folder(str(gt_dir), str(pred_dir), [1],
                              {1: 2.0}, str(tmp_path / "out.csv"))
    assert 0.5 < summary["mean_dsc"] < 1.0
    assert summary["mean_nsd"] > 0.5
    assert os.path.isfile(tmp_path / "out.csv")


def test_png_converter(tmp_path, rng):
    from PIL import Image

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_png_2d_dataset,
    )

    old_raw = paths.nnUNet_raw
    paths.nnUNet_raw = str(tmp_path / "raw")
    os.makedirs(paths.nnUNet_raw)
    try:
        img_dir = tmp_path / "imgs"
        mask_dir = tmp_path / "masks"
        img_dir.mkdir()
        mask_dir.mkdir()
        for i in range(3):
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            ).save(img_dir / f"im{i}.png")
            Image.fromarray(
                ((rng.rand(32, 32) > 0.5) * 255).astype(np.uint8)
            ).save(mask_dir / f"im{i}.png")
        out = convert_png_2d_dataset(str(img_dir), str(mask_dir), 901, "Test")
        assert os.path.isdir(os.path.join(out, "imagesTr"))
        assert len(os.listdir(os.path.join(out, "imagesTr"))) == 3
        from mlagg_unet_tpu.utils.helpers import load_json

        dj = load_json(os.path.join(out, "dataset.json"))
        assert dj["overwrite_image_reader_writer"] == "NaturalImage2DIO"
    finally:
        paths.nnUNet_raw = old_raw


def test_acdc_official_splits():
    from mlagg_unet_tpu.dataset_conversion.converters import (
        acdc_official_splits,
    )

    idents = [f"patient{p:03d}_frame01" for p in range(1, 101)]
    splits = acdc_official_splits(idents)
    assert len(splits) == 5
    assert len(splits[0]["val"]) == 20
    assert "patient001_frame01" in splits[0]["val"]
    assert "patient021_frame01" in splits[1]["val"]
    # disjoint folds covering all
    all_val = [v for s in splits for v in s["val"]]
    assert sorted(all_val) == sorted(idents)


def test_lr_schedules():
    from mlagg_unet_tpu.training.lr_schedule import (
        cosine_warmup_lr,
        poly_lr,
    )

    p = poly_lr(0.01, 1000)
    assert p(0) == 0.01
    assert p(500) < p(100)

    c = cosine_warmup_lr(5e-4, 500, lr_min=1e-6, warmup_epochs=10,
                         warmup_lr_init=1e-4)
    assert abs(float(c(0)) - 1e-4) < 1e-9
    assert float(c(10)) == pytest.approx(5e-4, rel=1e-3)
    assert float(c(499)) < 2e-5  # near lr_min at the end
    # warmup is monotonic increasing
    assert float(c(5)) > float(c(1))


def test_model_sharing_roundtrip(tmp_path):
    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.postprocessing.model_sharing import (
        export_pretrained_model,
        install_model_from_zip_file,
    )
    from mlagg_unet_tpu.utils.helpers import maybe_mkdir_p, save_json

    old_res, old_raw = paths.nnUNet_results, paths.nnUNet_raw
    paths.nnUNet_results = str(tmp_path / "res")
    paths.nnUNet_raw = str(tmp_path / "raw")
    try:
        model_dir = os.path.join(
            paths.nnUNet_results, "Dataset900_Fake",
            "nnUNetTrainer__nnUNetPlans__2d", "fold_0")
        maybe_mkdir_p(model_dir)
        maybe_mkdir_p(os.path.join(paths.nnUNet_raw, "Dataset900_Fake"))
        save_json({"a": 1}, os.path.join(os.path.dirname(model_dir),
                                         "plans.json"))
        save_json({"b": 2}, os.path.join(os.path.dirname(model_dir),
                                         "dataset.json"))
        with open(os.path.join(model_dir, "checkpoint_final.ckpt"), "wb") as f:
            f.write(b"fake")
        zip_path = str(tmp_path / "model.zip")
        export_pretrained_model("Dataset900_Fake", zip_path, ["2d"],
                                folds=(0,))
        assert os.path.isfile(zip_path)

        # install into a fresh results dir
        paths.nnUNet_results = str(tmp_path / "res2")
        os.makedirs(paths.nnUNet_results)
        install_model_from_zip_file(zip_path)
        assert os.path.isfile(os.path.join(
            paths.nnUNet_results, "Dataset900_Fake",
            "nnUNetTrainer__nnUNetPlans__2d", "fold_0",
            "checkpoint_final.ckpt"))
    finally:
        paths.nnUNet_results = old_res
        paths.nnUNet_raw = old_raw
