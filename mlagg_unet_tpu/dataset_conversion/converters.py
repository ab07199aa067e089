"""Dataset-specific raw -> framework-format converters.

Equivalents of the reference's dataset_conversion scripts (Dataset027_ACDC.py
with the official 5-fold split :28-41, MSD converter, ISIC/RoadSeg-style PNG
2D datasets). Each converter reads a user-downloaded raw layout and writes a
DatasetXXX_Name folder with imagesTr/labelsTr/dataset.json.
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from mlagg_unet_tpu import paths
from mlagg_unet_tpu.dataset_conversion.generate_dataset_json import (
    generate_dataset_json,
)
from mlagg_unet_tpu.utils.helpers import (
    isdir,
    isfile,
    join,
    load_json,
    maybe_mkdir_p,
    save_json,
    subdirs,
    subfiles,
)


def convert_msd_dataset(source_folder: str, output_dataset_id: int,
                        overwrite_name: Optional[str] = None) -> str:
    """Medical Segmentation Decathlon folder (imagesTr/labelsTr/dataset.json
    in MSD schema) -> framework format (reference convert_MSD_dataset.py)."""
    msd_json = load_json(join(source_folder, "dataset.json"))
    task_name = overwrite_name or msd_json["name"].replace(" ", "")
    dataset_name = f"Dataset{output_dataset_id:03d}_{task_name}"
    out = join(paths.nnUNet_raw, dataset_name)
    maybe_mkdir_p(join(out, "imagesTr"))
    maybe_mkdir_p(join(out, "labelsTr"))
    maybe_mkdir_p(join(out, "imagesTs"))

    modalities = msd_json.get("modality", {"0": "CT"})
    n_channels = len(modalities)
    file_ending = ".nii.gz"

    n_train = 0
    for entry in msd_json["training"]:
        img = os.path.basename(entry["image"])
        ident = img[: -len(file_ending)]
        src_img = join(source_folder, "imagesTr", img)
        if not isfile(src_img):
            continue
        # MSD images may be 4D (c last); our NIfTI reader handles 3D only,
        # so single-modality datasets copy through; multi-modality needs
        # per-channel splitting by the user upstream
        assert n_channels == 1, (
            "multi-channel MSD tasks need per-channel files; split upstream"
        )
        shutil.copy(src_img, join(out, "imagesTr", f"{ident}_0000{file_ending}"))
        shutil.copy(join(source_folder, "labelsTr", img),
                    join(out, "labelsTr", f"{ident}{file_ending}"))
        n_train += 1
    for entry in msd_json.get("test", []):
        img = os.path.basename(entry if isinstance(entry, str)
                               else entry["image"])
        src = join(source_folder, "imagesTs", img)
        if isfile(src):
            ident = img[: -len(file_ending)]
            shutil.copy(src, join(out, "imagesTs",
                                  f"{ident}_0000{file_ending}"))

    labels = {
        ("background" if str(v).lower() == "background" else str(v)): int(k)
        for k, v in msd_json["labels"].items()
    }
    generate_dataset_json(
        out, {i: m for i, m in enumerate(modalities.values())}, labels,
        n_train, file_ending, dataset_name=dataset_name,
    )
    return out


ACDC_OFFICIAL_SPLIT_SEED_PATIENTS = 100  # patient001..100, 20 per fold


def acdc_official_splits(identifiers: List[str]) -> List[Dict[str, List[str]]]:
    """The official ACDC 5-fold split by patient number
    (reference Dataset027_ACDC.py:28-41): patients partitioned into 5 groups
    of 20 by index."""
    def patient_of(ident: str) -> int:
        import re

        m = re.search(r"patient(\d+)", ident)
        return int(m.group(1)) if m else 0

    splits = []
    for fold in range(5):
        val_patients = set(range(fold * 20 + 1, (fold + 1) * 20 + 1))
        val = [i for i in identifiers if patient_of(i) in val_patients]
        train = [i for i in identifiers if i not in val]
        splits.append({"train": sorted(train), "val": sorted(val)})
    return splits


def convert_acdc(source_folder: str, output_dataset_id: int = 27) -> str:
    """ACDC 'database/training' layout -> Dataset027_ACDC with the official
    split saved as splits_final.json (reference Dataset027_ACDC.py)."""
    dataset_name = f"Dataset{output_dataset_id:03d}_ACDC"
    out = join(paths.nnUNet_raw, dataset_name)
    maybe_mkdir_p(join(out, "imagesTr"))
    maybe_mkdir_p(join(out, "labelsTr"))

    patients = subdirs(source_folder, prefix="patient", join_path=False)
    n = 0
    identifiers = []
    for pat in sorted(patients):
        pdir = join(source_folder, pat)
        frames = [f for f in os.listdir(pdir)
                  if f.endswith(".nii.gz") and "_gt" not in f
                  and "frame" in f and "_4d" not in f]
        for frame in sorted(frames):
            gt = frame.replace(".nii.gz", "_gt.nii.gz")
            if not isfile(join(pdir, gt)):
                continue
            ident = frame[: -len(".nii.gz")]
            identifiers.append(ident)
            shutil.copy(join(pdir, frame),
                        join(out, "imagesTr", f"{ident}_0000.nii.gz"))
            shutil.copy(join(pdir, gt),
                        join(out, "labelsTr", f"{ident}.nii.gz"))
            n += 1

    generate_dataset_json(
        out, {0: "cineMRI"},
        {"background": 0, "RV": 1, "MLV": 2, "LVC": 3},
        n, ".nii.gz", dataset_name=dataset_name,
    )
    # official split goes to preprocessed once planning ran; also stage here
    maybe_mkdir_p(join(paths.nnUNet_preprocessed, dataset_name))
    save_json(acdc_official_splits(identifiers),
              join(paths.nnUNet_preprocessed, dataset_name,
                   "splits_final.json"))
    return out


def convert_png_2d_dataset(
    images_folder: str,
    masks_folder: str,
    output_dataset_id: int,
    task_name: str,
    label_mapping: Dict[int, int] = None,
    is_rgb: bool = True,
) -> str:
    """Natural-image 2D datasets (ISIC2017, RoadSeg style): PNG images +
    binary/label masks -> framework format with NaturalImage2DIO."""
    from PIL import Image

    dataset_name = f"Dataset{output_dataset_id:03d}_{task_name}"
    out = join(paths.nnUNet_raw, dataset_name)
    maybe_mkdir_p(join(out, "imagesTr"))
    maybe_mkdir_p(join(out, "labelsTr"))

    images = subfiles(images_folder, suffix=".png", join_path=False)
    n = 0
    for img in sorted(images):
        mask_file = join(masks_folder, img)
        if not isfile(mask_file):
            continue
        ident = img[:-4]
        shutil.copy(join(images_folder, img),
                    join(out, "imagesTr", f"{ident}_0000.png"))
        mask = np.asarray(Image.open(mask_file))
        if mask.ndim == 3:
            mask = mask[..., 0]
        if label_mapping is not None:
            remapped = np.zeros_like(mask)
            for src, dst in label_mapping.items():
                remapped[mask == src] = dst
            mask = remapped
        else:
            mask = (mask > 127).astype(np.uint8)
        Image.fromarray(mask.astype(np.uint8)).save(
            join(out, "labelsTr", f"{ident}.png"))
        n += 1

    channels = ({0: "rgb_to_0_1", 1: "rgb_to_0_1", 2: "rgb_to_0_1"}
                if is_rgb else {0: "rescale_0_1"})
    generate_dataset_json(
        out, channels, {"background": 0, "foreground": 1}, n, ".png",
        dataset_name=dataset_name,
        overwrite_image_reader_writer="NaturalImage2DIO",
    )
    return out
