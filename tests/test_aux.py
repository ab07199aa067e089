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


def test_tiff_roundtrip(tmp_path, rng):
    from mlagg_unet_tpu.imageio.tiff_io import Tiff3DIO, read_tiff, write_tiff

    for dtype in (np.uint8, np.uint16, np.float32):
        arr = (rng.rand(4, 6, 5) * 100).astype(dtype)
        fn = str(tmp_path / f"x_{np.dtype(dtype).name}.tif")
        write_tiff(fn, arr)
        back = read_tiff(fn)
        np.testing.assert_array_equal(back, arr)

    # full IO class contract: sidecar spacing required + write_seg roundtrip
    io = Tiff3DIO()
    arr = (rng.rand(3, 8, 7) * 50).astype(np.uint16)
    fn = str(tmp_path / "case.tif")
    write_tiff(fn, arr)
    with pytest.raises(RuntimeError):
        io.read_images([fn])
    import json

    with open(str(tmp_path / "case.json"), "w") as f:
        json.dump({"spacing": [1.0, 0.5, 0.5]}, f)
    img, props = io.read_images([fn])
    assert img.shape == (1, 3, 8, 7)
    assert props["spacing"] == (1.0, 0.5, 0.5)
    io.write_seg(img[0].astype(np.uint8), str(tmp_path / "seg.tif"), props)
    assert os.path.isfile(tmp_path / "seg.json")
    np.testing.assert_array_equal(
        read_tiff(str(tmp_path / "seg.tif")), arr.astype(np.uint8))


def test_nibabel_reorient_io(tmp_path, rng):
    from mlagg_unet_tpu.imageio.nifti_io import (
        NibabelIOWithReorient,
        read_nifti,
        write_nifti,
    )

    data = (rng.rand(5, 6, 7) * 9).astype(np.float32)
    hdr = {"qform_code": 0, "sform_code": 1,
           "srows": (0, 0, -1.5, 0, -1.0, 0, 0, 0, 0, 2.0, 0, 0),
           "quatern": (0, 0, 0, 0, 0, 0)}
    fn = str(tmp_path / "img.nii.gz")
    write_nifti(fn, data, (1.0, 2.0, 1.5), hdr)
    io = NibabelIOWithReorient()
    img, props = io.read_images([fn])
    # spacing is permuted into RAS order (reversed (z,y,x) convention)
    assert sorted(props["spacing"]) == [1.0, 1.5, 2.0]
    io.write_seg(img[0].astype(np.uint8), str(tmp_path / "seg.nii.gz"), props)
    back, _ = read_nifti(str(tmp_path / "seg.nii.gz"))
    np.testing.assert_array_equal(back, data.astype(np.uint8))


def _with_raw_root(tmp_path):
    from mlagg_unet_tpu import paths

    old = paths.nnUNet_raw
    paths.nnUNet_raw = str(tmp_path / "raw")
    os.makedirs(paths.nnUNet_raw, exist_ok=True)
    return old


def test_brats_converter(tmp_path, rng):
    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_brats21,
        convert_folder_with_preds_back_to_brats,
    )
    from mlagg_unet_tpu.imageio.nifti_io import read_nifti, write_nifti
    from mlagg_unet_tpu.utils.helpers import load_json

    old = _with_raw_root(tmp_path)
    try:
        src = tmp_path / "brats"
        for c in ("BraTS2021_00000", "BraTS2021_00002"):
            (src / c).mkdir(parents=True)
            for mod in ("t1", "t1ce", "t2", "flair"):
                write_nifti(str(src / c / f"{c}_{mod}.nii.gz"),
                            rng.rand(6, 6, 6).astype(np.float32), (1, 1, 1))
            seg = rng.choice([0, 1, 2, 4], size=(6, 6, 6)).astype(np.uint8)
            write_nifti(str(src / c / f"{c}_seg.nii.gz"), seg, (1, 1, 1))
        out = convert_brats21(str(src), 937)
        assert len(os.listdir(os.path.join(out, "imagesTr"))) == 8
        dj = load_json(os.path.join(out, "dataset.json"))
        assert dj["labels"]["whole tumor"] == [1, 2, 3]
        # converted labels are continuous 0..3
        lab, _ = read_nifti(
            os.path.join(out, "labelsTr", "BraTS2021_00000.nii.gz"))
        assert set(np.unique(lab)) <= {0, 1, 2, 3}
        # back-conversion restores BraTS convention
        back_dir = str(tmp_path / "back")
        convert_folder_with_preds_back_to_brats(
            os.path.join(out, "labelsTr"), back_dir)
        b, _ = read_nifti(os.path.join(back_dir, "BraTS2021_00000.nii.gz"))
        assert set(np.unique(b)) <= {0, 1, 2, 4}
    finally:
        paths.nnUNet_raw = old


def test_kits_btcv_amos_converters(tmp_path, rng):
    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_amos,
        convert_btcv,
        convert_kits2023,
    )
    from mlagg_unet_tpu.imageio.nifti_io import write_nifti
    from mlagg_unet_tpu.utils.helpers import load_json, save_json

    old = _with_raw_root(tmp_path)
    try:
        # KiTS
        for c in ("case_00000", "case_00001"):
            d = tmp_path / "kits" / c
            d.mkdir(parents=True)
            write_nifti(str(d / "imaging.nii.gz"),
                        rng.rand(4, 4, 4).astype(np.float32), (1, 1, 1))
            write_nifti(str(d / "segmentation.nii.gz"),
                        rng.choice([0, 1, 2, 3], (4, 4, 4)).astype(np.uint8),
                        (1, 1, 1))
        out = convert_kits2023(str(tmp_path / "kits"), 920)
        dj = load_json(os.path.join(out, "dataset.json"))
        assert dj["regions_class_order"] == [1, 3, 2]

        # BTCV
        for sub in ("Training/img", "Training/label", "Testing/img"):
            (tmp_path / "btcv" / sub).mkdir(parents=True)
        write_nifti(str(tmp_path / "btcv/Training/img/img0001.nii.gz"),
                    rng.rand(4, 4, 4).astype(np.float32), (1, 1, 1))
        write_nifti(str(tmp_path / "btcv/Training/label/label0001.nii.gz"),
                    rng.choice(range(14), (4, 4, 4)).astype(np.uint8),
                    (1, 1, 1))
        out = convert_btcv(str(tmp_path / "btcv"), 917)
        assert os.path.isfile(
            os.path.join(out, "imagesTr", "ABD_001_0000.nii.gz"))
        assert os.path.isfile(
            os.path.join(out, "labelsTr", "ABD_001.nii.gz"))

        # AMOS (CT id 7 kept for task 1; MRI id 550 dropped)
        amos = tmp_path / "amos"
        for sub in ("imagesTr", "labelsTr", "imagesVa", "labelsVa",
                    "imagesTs"):
            (amos / sub).mkdir(parents=True)
        for ident, sub in (("amos_0007", "Tr"), ("amos_0550", "Tr")):
            write_nifti(str(amos / f"images{sub}" / f"{ident}.nii.gz"),
                        rng.rand(4, 4, 4).astype(np.float32), (1, 1, 1))
            write_nifti(str(amos / f"labels{sub}" / f"{ident}.nii.gz"),
                        rng.choice([0, 1], (4, 4, 4)).astype(np.uint8),
                        (1, 1, 1))
        save_json({
            "labels": {"0": "background", "1": "spleen"},
            "training": [{"image": f"./imagesTr/amos_{i}.nii.gz"}
                         for i in ("0007", "0550")],
            "validation": [], "test": [],
        }, str(amos / "dataset.json"))
        out = convert_amos(str(amos), task=1, output_dataset_id=918)
        assert len(os.listdir(os.path.join(out, "imagesTr"))) == 1
        dj = load_json(os.path.join(out, "dataset.json"))
        assert dj["overwrite_image_reader_writer"] == "NibabelIOWithReorient"
        out2 = convert_amos(str(amos), task=2, output_dataset_id=919)
        assert len(os.listdir(os.path.join(out2, "imagesTr"))) == 2
    finally:
        paths.nnUNet_raw = old


def test_fluo_and_road_converters(tmp_path, rng):
    from PIL import Image

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.dataset_conversion.converters import (
        convert_fluo_c3dh,
        convert_road_segmentation,
    )
    from mlagg_unet_tpu.imageio.tiff_io import read_tiff, write_tiff
    from mlagg_unet_tpu.utils.helpers import load_json

    old = _with_raw_root(tmp_path)
    try:
        # Fluo: tif train sequences
        fluo = tmp_path / "fluo"
        for seq in ("01", "02"):
            (fluo / seq).mkdir(parents=True)
            (fluo / (seq + "_GT") / "SEG").mkdir(parents=True)
            write_tiff(str(fluo / seq / "t000.tif"),
                       (rng.rand(3, 6, 5) * 100).astype(np.uint16))
            write_tiff(str(fluo / (seq + "_GT") / "SEG" / "seg000.tif"),
                       rng.choice([0, 1], (3, 6, 5)).astype(np.uint8))
        out = convert_fluo_c3dh(str(fluo), output_dataset_id=973)
        dj = load_json(os.path.join(out, "dataset.json"))
        assert dj["overwrite_image_reader_writer"] == "Tiff3DIO"
        assert os.path.isfile(
            os.path.join(out, "imagesTr", "01_image_000.json"))
        arr = read_tiff(os.path.join(out, "imagesTr", "01_image_000_0000.tif"))
        assert arr.shape == (3, 6, 5)

        # RoadSeg: white no-data areas clear the road label
        road = tmp_path / "road"
        for sub in ("training/input", "training/output"):
            (road / sub).mkdir(parents=True)
        img = np.zeros((20, 20, 3), np.uint8)
        img[:10, :10] = 255  # white no-data block (>50 px)
        Image.fromarray(img).save(road / "training/input/a.png")
        seg = np.full((20, 20), 255, np.uint8)
        Image.fromarray(seg).save(road / "training/output/a.png")
        out = convert_road_segmentation(str(road), output_dataset_id=921)
        lab = np.asarray(Image.open(
            os.path.join(out, "labelsTr", "a.png")))
        assert set(np.unique(lab)) == {0, 1}
        assert (lab[:10, :10] == 0).all()  # road removed under no-data
        assert (lab[10:, 10:] == 1).all()
    finally:
        paths.nnUNet_raw = old


def test_isic_converter(tmp_path, rng):
    from PIL import Image

    from mlagg_unet_tpu import paths
    from mlagg_unet_tpu.dataset_conversion.converters import convert_isic2017

    old = _with_raw_root(tmp_path)
    try:
        src = tmp_path / "isic"
        (src / "ISIC-2017_Training_Data").mkdir(parents=True)
        (src / "ISIC-2017_Training_Part1_GroundTruth").mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                (rng.rand(64, 48, 3) * 255).astype(np.uint8)).save(
                src / "ISIC-2017_Training_Data" / f"ISIC_{i:07d}.jpg")
            Image.fromarray(
                ((rng.rand(64, 48) > 0.5) * 255).astype(np.uint8)).save(
                src / "ISIC-2017_Training_Part1_GroundTruth" /
                f"ISIC_{i:07d}_segmentation.png")
        out = convert_isic2017(str(src), output_dataset_id=916)
        img = np.asarray(Image.open(
            os.path.join(out, "imagesTr", "ISIC_0000000_0000.png")))
        assert img.shape == (256, 256, 3)
        seg = np.asarray(Image.open(
            os.path.join(out, "labelsTr", "ISIC_0000000.png")))
        assert set(np.unique(seg)) <= {0, 1}
    finally:
        paths.nnUNet_raw = old


def test_torch_checkpoint_import(tmp_path, rng):
    """Torch .pth import: layout conversion gives numerically identical
    forward passes (torch Conv2d/Linear vs flax with transferred weights)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn as tnn
    from flax import linen as fnn

    from mlagg_unet_tpu.training.torch_import import (
        load_pretrained_torch_weights,
    )

    class TorchNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(3, 8, 3, padding=1)
            self.fc = tnn.Linear(8, 4)

        def forward(self, x):
            h = self.conv(x)
            return self.fc(h.permute(0, 2, 3, 1))

    class FlaxNet(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            h = fnn.Conv(8, (3, 3), padding="SAME", name="conv")(x)
            return fnn.Dense(4, name="fc")(h)

    tnet = TorchNet()
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save({"network_weights": {
        "module." + k: v for k, v in tnet.state_dict().items()
    }}, ckpt_path)

    fnet = FlaxNet()
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    params = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    new_params, n_tr, n_tot = load_pretrained_torch_weights(params, ckpt_path)
    assert n_tr == n_tot == 4  # conv kernel+bias, fc kernel+bias

    out_flax = np.asarray(fnet.apply({"params": new_params}, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = tnet(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5)


def test_profiling_helpers_importable():
    """Observability subsystem (SURVEY.md §5): trace-based timing helpers
    are part of the package and run off-TPU (empty trace -> zero totals)."""
    import jax
    import jax.numpy as jnp

    from mlagg_unet_tpu.utils.profiling import device_time_ms

    fn = jax.jit(lambda x: (x * 2).sum())
    ms, top = device_time_ms(fn, jnp.ones((8, 8)), iters=1)
    assert ms >= 0.0
    assert isinstance(top, list)
