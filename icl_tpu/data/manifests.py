"""Vendored split-manifest resolution.

The reference ships the official semi-supervised split definitions as
repo files (reference `data/ACDC/train_slices.list`,
`data/BraTS2019/train.txt`, `data/AMOS22/dataset_semi_ct.json`); the
protocol's labeled/unlabeled splits are unreproducible without them.
This repo vendors the same files under `<repo>/data/` and the dataset
loaders fall back to them when the user's dataset root doesn't contain
its own copy — so a data directory holding only the `.h5` volumes works
out of the box while a user-provided list still wins.
"""
from __future__ import annotations

import os

# <repo>/data — two levels up from icl_tpu/data/manifests.py
VENDORED_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)

_DATASET_DIRS = {"ACDC": "ACDC", "BraTS2019": "BraTS2019", "AMOS22": "AMOS22"}


def vendored_path(dataset: str, filename: str) -> str:
    return os.path.join(VENDORED_ROOT, _DATASET_DIRS[dataset], filename)


def resolve_manifest(base_dir: str, filename: str, dataset: str) -> str:
    """Path of `filename`: the dataset root's own copy if present,
    otherwise the repo-vendored official split. Returns the root path
    unchanged when neither exists (the caller's open() then raises with
    the path the user actually asked for)."""
    local = os.path.join(base_dir, filename)
    if os.path.exists(local):
        return local
    vendored = vendored_path(dataset, filename) if dataset in _DATASET_DIRS else local
    if os.path.exists(vendored):
        return vendored
    return local
