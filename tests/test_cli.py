"""CLI verb coverage: name parity with the reference console scripts
(/root/reference/mlagg/setup.py:40-64), --help smoke for every verb, and
functional tests for the pure-filesystem verbs."""
import os
import re

import numpy as np
import pytest

from mlagg_unet_tpu.cli import entrypoints


# the 21 reference console scripts, nnUNetv2_ prefix stripped
_REFERENCE_VERBS = {
    "plan_and_preprocess", "extract_fingerprint", "plan_experiment",
    "preprocess", "train", "predict_from_modelfolder", "predict",
    "convert_old_nnUNet_dataset", "find_best_configuration",
    "determine_postprocessing", "apply_postprocessing", "ensemble",
    "accumulate_crossval_results", "plot_overlay_pngs",
    "download_pretrained_model_by_url", "install_model", "export_model",
    "move_plans_between_datasets", "evaluate_folder", "evaluate_simple",
    "convert_MSD_dataset",
}


def test_verb_name_parity_with_reference():
    assert set(entrypoints._VERBS) == _REFERENCE_VERBS


def test_all_verbs_wired_as_console_scripts():
    """Every verb must be installable as a console script, matching the
    reference's 21-script surface (/root/reference/mlagg/setup.py:40-64)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    src = open(os.path.join(root, "pyproject.toml")).read()
    scripts = dict(re.findall(
        r'mlaggtpu_(\w+) = "mlagg_unet_tpu\.cli\.entrypoints:(\w+)"', src))
    # console-script names carry the reference's long-form suffixes
    canon = {n.replace("install_pretrained_model_from_zip", "install_model")
             .replace("export_model_to_zip", "export_model"): fn
             for n, fn in scripts.items()}
    assert set(canon) == _REFERENCE_VERBS
    for verb, fn in canon.items():
        assert entrypoints._VERBS[verb] is getattr(entrypoints, fn)


def test_reference_setup_lists_exactly_these_verbs():
    """Guard the golden list above against silent drift: re-derive it from
    the reference setup.py when available."""
    path = "/root/reference/mlagg/setup.py"
    if not os.path.isfile(path):
        pytest.skip("reference not present")
    src = open(path).read()
    names = set(re.findall(r"'nnUNetv2_(\w+) =", src))
    # install/export carry the _pretrained_model_from_zip/_to_zip suffixes
    names = {n.replace("install_pretrained_model_from_zip", "install_model")
             .replace("export_model_to_zip", "export_model")
             for n in names}
    assert names == _REFERENCE_VERBS


@pytest.mark.parametrize("verb", sorted(_REFERENCE_VERBS))
def test_verb_help_smoke(verb, capsys):
    with pytest.raises(SystemExit) as exc:
        entrypoints._VERBS[verb](["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def _write_nifti(path, arr, spacing=(1.0, 1.0, 1.0)):
    from mlagg_unet_tpu.imageio.nifti_io import NibabelIO

    NibabelIO().write_seg(arr.astype(np.uint8), path,
                          {"spacing": list(spacing)})


def test_convert_old_nnunet_dataset(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    monkeypatch.setattr("mlagg_unet_tpu.paths.nnUNet_raw", str(raw))
    src = tmp_path / "Task099_Old"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    seg = np.zeros((4, 5, 6))
    _write_nifti(str(src / "imagesTr" / "case_0000.nii.gz"), seg)
    _write_nifti(str(src / "labelsTr" / "case.nii.gz"), seg)
    import json
    (src / "dataset.json").write_text(json.dumps({
        "tensorImageSize": "3D", "numTest": 0, "training": [], "test": [],
        "modality": {"0": "CT"},
        "labels": {"0": "background", "1": "organ"},
    }))
    entrypoints.convert_old_nnunet_dataset_entry(
        [str(src), "Dataset099_Old"])
    dsj = json.loads((raw / "Dataset099_Old" / "dataset.json").read_text())
    assert dsj["channel_names"] == {"0": "CT"}
    assert dsj["labels"] == {"background": 0, "organ": 1}
    assert dsj["file_ending"] == ".nii.gz"
    assert "training" not in dsj and "modality" not in dsj
    assert (raw / "Dataset099_Old" / "imagesTr" / "case_0000.nii.gz").exists()


def test_move_plans_between_datasets(tmp_path, monkeypatch):
    import json

    raw = tmp_path / "raw"
    pre = tmp_path / "pre"
    monkeypatch.setattr("mlagg_unet_tpu.paths.nnUNet_raw", str(raw))
    monkeypatch.setattr("mlagg_unet_tpu.paths.nnUNet_preprocessed", str(pre))
    (pre / "Dataset001_A").mkdir(parents=True)
    (pre / "Dataset002_B").mkdir(parents=True)
    plans = {"dataset_name": "Dataset001_A",
             "image_reader_writer": "NibabelIO",
             "configurations": {"3d_fullres":
                                {"data_identifier": "nnUNetPlans_3d_fullres"}}}
    (pre / "Dataset001_A" / "nnUNetPlans.json").write_text(json.dumps(plans))
    (raw / "Dataset002_B" / "imagesTr").mkdir(parents=True)
    _write_nifti(str(raw / "Dataset002_B" / "imagesTr" / "x_0000.nii.gz"),
                 np.zeros((3, 3, 3)))
    (raw / "Dataset002_B" / "dataset.json").write_text(json.dumps(
        {"file_ending": ".nii.gz", "channel_names": {"0": "CT"},
         "labels": {"background": 0}}))

    entrypoints.move_plans_between_datasets_entry(
        ["-s", "Dataset001_A", "-t", "Dataset002_B", "-sp", "nnUNetPlans",
         "-tp", "movedPlans"])
    out = json.loads((pre / "Dataset002_B" / "movedPlans.json").read_text())
    assert out["dataset_name"] == "Dataset002_B"
    assert (out["configurations"]["3d_fullres"]["data_identifier"]
            == "movedPlans_3d_fullres")
    assert out["image_reader_writer"]
