"""Model export/import as zip
(reference: model_sharing/model_export.py:6, model_import.py:6).
"""
from __future__ import annotations

import os
import zipfile
from typing import Sequence

from mlagg_unet_tpu import paths
from mlagg_unet_tpu.utils.helpers import (
    get_output_folder,
    isdir,
    isfile,
    join,
    maybe_convert_to_dataset_name,
)


def export_pretrained_model(
    dataset_name_or_id,
    output_file: str,
    configurations: Sequence[str] = ("2d", "3d_fullres"),
    trainer: str = "nnUNetTrainer",
    plans_identifier: str = "nnUNetPlans",
    folds: Sequence = (0, 1, 2, 3, 4),
    checkpoint_names: Sequence[str] = ("checkpoint_final.ckpt",),
    export_crossval_predictions: bool = False,
) -> None:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    with zipfile.ZipFile(output_file, "w", zipfile.ZIP_DEFLATED) as zf:
        for c in configurations:
            folder = get_output_folder(dataset_name, trainer,
                                       plans_identifier, c)
            if not isdir(folder):
                raise RuntimeError(f"missing trained model: {folder}")
            for root, _, files in os.walk(folder):
                for f in files:
                    full = join(root, f)
                    keep = (
                        f in ("plans.json", "dataset.json", "debug.json",
                              "progress.png", "postprocessing.pkl")
                        or f in checkpoint_names
                        or f.startswith("training_log")
                        or (export_crossval_predictions
                            and ("validation" in root
                                 or "crossval_results" in root))
                    )
                    if keep:
                        zf.write(full, os.path.relpath(
                            full, paths.nnUNet_results))
        info = join(paths.nnUNet_results, dataset_name,
                    "inference_information.json")
        if isfile(info):
            zf.write(info, os.path.relpath(info, paths.nnUNet_results))


def install_model_from_zip_file(zip_file: str) -> None:
    with zipfile.ZipFile(zip_file, "r") as zf:
        zf.extractall(paths.nnUNet_results)


def download_and_install_pretrained_model(url: str,
                                          timeout: float = 600.0) -> None:
    """Download a model zip from a URL and install it (reference
    model_sharing/model_download.py:11). Uses stdlib urllib; in zero-egress
    environments this raises with a hint to use install_model_from_zip_file
    on a manually transferred archive."""
    import tempfile
    import urllib.request

    with tempfile.NamedTemporaryFile(suffix=".zip", delete=False) as tmp:
        tmp_path = tmp.name
    try:
        urllib.request.urlretrieve(url, tmp_path)  # nosec - user-given URL
    except Exception as exc:
        raise RuntimeError(
            f"Could not download {url} ({exc}). If this environment has no "
            "network egress, transfer the zip manually and run "
            "install_model_from_zip_file(<path>)."
        ) from exc
    install_model_from_zip_file(tmp_path)
