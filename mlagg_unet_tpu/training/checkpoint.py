"""Checkpointing: single-directory orbax pytree checkpoints with the
reference's 3-name contract (checkpoint_latest / checkpoint_best /
checkpoint_final — reference nnUNetTrainer.py:1007-1054). The payload mirrors
the reference dict: network weights, optimizer state, logger history,
best-EMA, epoch, trainer name and init args (inference rebuilds the right
architecture from these, predict_from_raw_data.py:83-99).
"""
from __future__ import annotations

import os
import pickle
import shutil
from typing import Any

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_checkpoint(state: dict, path: str) -> None:
    """Atomic single-file pickle of a numpy-ified pytree. (orbax's directory
    format is overkill single-host; this mirrors the reference's single-file
    torch.save contract and stays dependency-light.)"""
    state = _to_numpy_tree(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
